"""Pipeline parallelism over a "pp" mesh axis.

The TPU-native counterpart of the reference's layer-split mode
(LLAMA_SPLIT_MODE_LAYER, ggml-backend.cpp:712-718 n_copies microbatch
overlap): layers are split into `n_stages` contiguous stages, every
stage's layer stack lives on one mesh slice (leading stage axis sharded
P("pp")), and a GPipe-style rotation streams `n_micro` microbatches
through the stages with `lax.ppermute` hops — all inside ONE jitted
shard_map, so XLA overlaps each stage's compute with its neighbours'
ICI transfers.  At steady state every stage computes a different
microbatch simultaneously: pipeline bubble = (n_stages-1)/(n_micro +
n_stages-1).

Design notes (vs a CUDA/ggml translation):
  * Stage weights are STACKED per layer (QTensor is a pytree node, so
    tree_map(stack) stacks each quantized plane and layer slicing inside
    `lax.scan` rebuilds a per-layer QTensor view for the fused Pallas
    kernels — no unpack/repack, no Python dispatch per layer).
  * SPMD: every device runs the same program; stage identity comes from
    lax.axis_index("pp").  Invalid (warmup/drain) microbatch slots write
    their KV into a trash batch row appended to the cache, the same
    write-before-attend convention the serving engine uses.
  * Composes with tensor parallelism: pass a mesh with ("pp", "tp") axes
    and the TP plan shards each stacked weight's inner dims while "pp"
    shards the stage axis (zllm.parallel.tp plans operate per layer and
    apply unchanged one axis deeper).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.repack import QTensor, QTensorE


def make_pp_mesh(devices=None, pp: int | None = None, tp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if pp is None:
        pp = n // tp
    assert pp * tp == n, f"pp({pp}) * tp({tp}) != {n} devices"
    return Mesh(np.asarray(devices).reshape(pp, tp), axis_names=("pp", "tp"))


def _stack(xs):
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *xs)


def stage_params(params: dict, n_stages: int):
    """Split params["layers"] into n_stages stacked stages.

    Returns (shared, stages) where `stages` has every layer-leaf with a
    leading [n_stages, layers_per_stage] axis pair (QTensor planes
    included — QTensor's pytree registration carries fmt/shape/fold
    through the stack) and `shared` holds tok_emb/out_norm/output.
    All layers must share one pytree structure (uniform-architecture
    models; the reference's per-layer heterogeneity lives in hparams,
    not structure)."""
    layers = params["layers"]
    n_layers = len(layers)
    assert n_layers % n_stages == 0, f"{n_layers} layers not divisible by {n_stages} stages"
    lp = n_layers // n_stages
    stacked = _stack(layers)  # leaves [L, ...]
    stages = jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, lp, *x.shape[1:]), stacked
    )
    shared = {k: v for k, v in params.items() if k != "layers"}
    return shared, stages


def _layer_view(stage_stack, i):
    """Layer `i` (traced ok) of a stacked stage: dynamic-slice every leaf;
    QTensor aux (fmt/shape/fold) survives the tree_map."""
    return jax.tree_util.tree_map(
        lambda x: lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False), stage_stack
    )


class StageKV:
    """Per-stage KV cache for the pipeline loop: stacked [Lp, B+mb, H, S, D]
    arrays with a traced layer index and `mb` trailing trash batch rows
    for warmup/drain steps (invalid microbatches write there; those rows
    are never read)."""

    def __init__(self, k, v, batch_off):
        self.k = k  # [Lp, B+mb, H, S, D]
        self.v = v
        self.batch_off = batch_off  # traced scalar: row offset of this microbatch

    @classmethod
    def create(cls, layers_per_stage, batch, mb, n_kv_heads, max_len, head_dim, dtype=jnp.bfloat16):
        shape = (layers_per_stage, batch + mb, n_kv_heads, max_len, head_dim)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def update(self, il, k_new, v_new, positions):
        # per-row positions [mb, T]: continuous-batching slots each carry
        # their own position (idle rows use the engine's past-horizon trash
        # convention), so the write is a row-wise scatter, not one DUS
        kt = k_new.astype(self.k.dtype)  # [mb, T, H, D]
        vt = v_new.astype(self.v.dtype)
        mb = positions.shape[0]
        rows = self.batch_off + jnp.arange(mb, dtype=jnp.int32)
        k = self.k.at[il, rows[:, None], :, positions, :].set(kt, mode="drop")
        v = self.v.at[il, rows[:, None], :, positions, :].set(vt, mode="drop")
        return StageKV(k, v, self.batch_off)

    def layer(self, il):
        mb = self.k.shape[1]  # sliced below
        return (
            lax.dynamic_index_in_dim(self.k, il, axis=0, keepdims=False),
            lax.dynamic_index_in_dim(self.v, il, axis=0, keepdims=False),
        )


def _run_stage(stage_stack, cfg, x, positions, kvk, kvv, batch_off, mb, base=0):
    """Scan this device's layer stack over activation x [mb, T, K].

    `base` is the stage's global layer offset (sid * layers_per_stage,
    traced): interleaved sliding-window stacks (gemma2/3-style
    swa_pattern) dispatch per layer through lax.cond on the GLOBAL index,
    so both the SWA and the full-attention graph stay uniform across the
    scan (the round-3 guard rejected these outright)."""
    from ..models.llama import layer_forward

    lp = jax.tree_util.tree_leaves(stage_stack)[0].shape[0]
    interleaved = cfg.sliding_window > 0 and cfg.swa_pattern > 1
    has_nope = bool(cfg.nope_step)
    window = cfg.sliding_window or 0  # uniform-window models under PP
    # per-GLOBAL-layer dispatch masks: the scan's layer index is traced, so
    # SWA interleave (gemma2/3, gpt-oss) and per-layer NoPE (smollm3,
    # cohere2, exaone4, smallthinker) select their branch via lax.cond /
    # lax.switch on a gathered constant — every branch builds the same
    # uniform graph shape (this is what lifted the round-4 NoPE rejection)
    swa_mask = (np.asarray([cfg.is_swa_layer(l) for l in range(cfg.n_layers)])
                if interleaved else None)
    nope_mask = (np.asarray([cfg.is_nope_layer(l) for l in range(cfg.n_layers)])
                 if has_nope else None)

    def run_layer(layer, x, kvk, kvv, i):
        gil = base + i  # global layer index (traced)

        def go(w, nope=None):
            kv = _MBView(StageKV(kvk, kvv, batch_off), mb) if kvk is not None else None
            x2, kv2 = layer_forward(layer, cfg, x, positions, kv, i, window=w,
                                    nope=nope, il_global=gil)
            if kvk is None:
                return x2
            return x2, kv2.kv.k, kv2.kv.v

        if not interleaved and not has_nope:
            return go(window)
        if interleaved and has_nope:
            sel = (jnp.asarray(swa_mask)[gil].astype(jnp.int32)
                   + 2 * jnp.asarray(nope_mask)[gil].astype(jnp.int32))
            return lax.switch(sel, [
                lambda: go(0, False), lambda: go(cfg.sliding_window, False),
                lambda: go(0, True), lambda: go(cfg.sliding_window, True),
            ])
        if interleaved:
            is_swa = jnp.asarray(swa_mask)[gil]
            return lax.cond(is_swa, lambda: go(cfg.sliding_window), lambda: go(0))
        is_nope = jnp.asarray(nope_mask)[gil]
        return lax.cond(is_nope, lambda: go(window, True), lambda: go(window, False))

    if kvk is None:
        def body(carry, i):
            x = carry
            layer = _layer_view(stage_stack, i)
            x = run_layer(layer, x, None, None, i)
            return x, None

        x, _ = lax.scan(body, x, jnp.arange(lp))
        return x, None, None

    def body(carry, i):
        x, kvk, kvv = carry
        layer = _layer_view(stage_stack, i)
        # the _MBView inside run_layer slices the full stage cache down to
        # this microbatch's rows for attention reads
        x, kvk, kvv = run_layer(layer, x, kvk, kvv, i)
        return (x, kvk, kvv), None

    (x, kvk, kvv), _ = lax.scan(body, (x, kvk, kvv), jnp.arange(lp))
    return x, kvk, kvv


class _MBView:
    """Restrict a StageKV to one microbatch's `mb` rows: updates write at
    batch_off, reads slice [batch_off : batch_off+mb]."""

    def __init__(self, kv: StageKV, mb: int):
        self.kv = kv
        self.mb = mb

    def update(self, il, k_new, v_new, positions):
        self.kv = self.kv.update(il, k_new, v_new, positions)
        return self

    def layer(self, il):
        k, v = self.kv.layer(il)  # [B+mb, H, S, D]
        k = lax.dynamic_slice_in_dim(k, self.kv.batch_off, self.mb, axis=0)
        v = lax.dynamic_slice_in_dim(v, self.kv.batch_off, self.mb, axis=0)
        return k, v


def pp_forward_fn(cfg, mesh: Mesh, n_micro: int, *, with_kv: bool = False, logits_for: str = "all"):
    """Build the jitted pipeline forward.

    Returns step(shared, stages, tokens [B, T], positions[, kvk, kvv])
    -> logits [B, T|1, vocab] (f32, replicated) [, (kvk, kvv)].
    B must equal n_micro * mb for some microbatch size mb; `stages` comes
    from stage_params + device_put with pp_specs."""
    from ..models.llama import embed
    from ..ops.layers import rms_norm
    from ..ops.linear import linear

    # PP scans the layer stack with a TRACED layer index.  Interleaved
    # sliding-window patterns (gemma2/3, gpt-oss), per-layer NoPE
    # (smollm3/cohere2/exaone4), and per-layer xIELU params (apertus)
    # dispatch per layer via lax.cond/switch/gather on the global index
    # (_run_stage.run_layer); recurrent/hybrid stacks still vary the graph
    # in ways the scan body can't express, so those stay rejected rather
    # than silently wrong.
    if cfg.attn_layers is not None or cfg.is_recurrent or cfg.is_hybrid:
        raise NotImplementedError(
            f"{cfg.arch}: recurrent/hybrid layer stacks are not supported "
            "under pipeline parallelism")

    n_stages = mesh.shape["pp"]

    def fn(shared, stages, tokens, positions, kvk, kvv):
        local = jax.tree_util.tree_map(lambda x: x[0], stages)  # drop unit stage axis
        sid = lax.axis_index("pp")
        b, t = tokens.shape
        mb = b // n_micro
        kdim = shared["tok_emb"].shape[1]
        dtype = shared["tok_emb"].dtype
        lp = cfg.n_layers // n_stages
        base = sid * lp  # global layer offset of this stage
        if kvk is not None:
            kvk, kvv = kvk[0], kvv[0]

        toks_m = tokens.reshape(n_micro, mb, t)
        pos_m = positions.reshape(n_micro, mb, t)
        out = jnp.zeros((n_micro, mb, t, kdim), dtype)
        recv = jnp.zeros((mb, t, kdim), dtype)

        for s in range(n_micro + n_stages - 1):
            # stage p handles microbatch m = s - p at this step
            m = s - sid
            valid = (m >= 0) & (m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            x0 = embed(shared, cfg, toks_m[mc])
            x_in = jnp.where(sid == 0, x0, recv).astype(dtype)
            # invalid slots write KV into the trash rows at batch B
            batch_off = jnp.where(valid, mc * mb, n_micro * mb)
            x_out, kvk, kvv = _run_stage(local, cfg, x_in, pos_m[mc], kvk, kvv,
                                         batch_off, mb, base=base)
            last = (sid == n_stages - 1) & valid
            out = out.at[mc].set(jnp.where(last, x_out, out[mc]))
            if s < n_micro + n_stages - 2:
                recv = lax.ppermute(
                    x_out, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)]
                )

        # only the last stage holds real outputs; replicate via psum
        out = lax.psum(jnp.where(sid == n_stages - 1, out, 0), "pp")
        x = out.reshape(b, t, kdim)
        x = rms_norm(x, shared["out_norm"], cfg.norm_eps)
        if logits_for == "last":
            x = x[:, -1:, :]
        logits = linear(x, shared["output"]).astype(jnp.float32)
        if logits.shape[-1] != cfg.vocab_size:
            logits = logits[..., : cfg.vocab_size]
        if cfg.logit_scale != 1.0:
            logits = logits * cfg.logit_scale
        if cfg.final_logit_softcap > 0:
            logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
        if kvk is None:
            return logits
        return logits, kvk[None], kvv[None]

    shared_spec = P()  # embeddings/out-norm/head replicated (cheap at PP scale)
    stage_spec = P("pp")
    data_spec = P()
    kv_spec = P("pp")

    if with_kv:
        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(shared_spec, stage_spec, data_spec, data_spec, kv_spec, kv_spec),
            out_specs=(P(), kv_spec, kv_spec),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(4, 5))

    def fn2(shared, stages, tokens, positions):
        return fn(shared, stages, tokens, positions, None, None)

    mapped = jax.shard_map(
        fn2, mesh=mesh,
        in_specs=(shared_spec, stage_spec, data_spec, data_spec),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def pp_put(shared, stages, mesh: Mesh):
    """device_put the stage stacks with the "pp" sharding (and shared
    weights replicated)."""
    stage_sharding = NamedSharding(mesh, P("pp"))
    rep = NamedSharding(mesh, P())
    stages = jax.tree_util.tree_map(lambda x: jax.device_put(x, stage_sharding), stages)
    shared = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), shared)
    return shared, stages


def pp_kv_create(cfg, mesh: Mesh, n_micro: int, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Stacked pipeline KV [n_stages, Lp, B+mb, H, S, D], "pp"-sharded.
    Trailing mb batch rows are the warmup/drain trash region."""
    n_stages = mesh.shape["pp"]
    lp = cfg.n_layers // n_stages
    mb = batch // n_micro
    shape = (n_stages, lp, batch + mb, cfg.n_kv_heads, max_len, cfg.head_dim)
    sharding = NamedSharding(mesh, P("pp"))
    return (
        jax.device_put(jnp.zeros(shape, dtype), sharding),
        jax.device_put(jnp.zeros(shape, dtype), sharding),
    )
