"""Tensor/data parallelism over a TPU device mesh.

The TPU-native replacement for the reference's multi-device split modes
(reference: LLAMA_SPLIT_MODE_ROW, ggml-cuda split-buffer row striping at
ggml/src/ggml-cuda/ggml-cuda.cu:777-867, and the RPC backend ggml-rpc):
instead of striping rows over sockets with a host coordinator, weights get
Megatron-style shardings on a `jax.sharding.Mesh` and the forward runs
inside `shard_map`; the collectives (psum after K-sharded matmuls,
all_gather of the vocab-sharded head) are attached to the weights
themselves as QTensor flags and fire inside zllm.ops.linear, so a weight
that cannot be sharded consistently simply stays replicated and the math
remains correct.  The fused Pallas dequant kernels run on local shards.

Sharding plan (mesh axes "dp" data / "tp" tensor):
  wq/wk/wv, ffn_gate/up : output-feature sharded     -> P(None, tp)
  wo, ffn_down          : contraction sharded + psum -> P(tp, None)
  output head           : vocab sharded + all_gather -> P(None, tp)
  embeddings, norms, MoE stacks, odd-sized weights   : replicated
  KV cache (per-layer [B, H, S, D]) : kv-heads over tp, batch over dp
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.repack import QTensor, QTensorE


def make_mesh(devices=None, dp: int = 1, tp: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _k_shardable(w, tp: int) -> bool:
    """K-sharded weights must split on fold-chunk boundaries so the packed
    planes stay valid per shard."""
    if isinstance(w, QTensor):
        k = w.shape[0]
        return k % tp == 0 and (k // w.fold) % tp == 0
    return False  # dense K-shard would need a psum flag it can't carry


def _n_shardable(w, tp: int) -> bool:
    n = w.shape[1]
    return n % tp == 0


@dataclass(frozen=True)
class TpPlan:
    """Which sub-blocks shard consistently for a given (model, tp)."""

    attn: bool  # wq/wk/wv N-shard, wo K-shard+psum
    kv: bool  # KV cache heads sharded (follows attn)
    ffn: bool  # gate/up N-shard, down K-shard+psum
    vocab: bool  # output head vocab-shard + gather
    moe: bool = False  # expert stacks E-sharded over tp + psum combine (EP)


def plan_for(cfg, params, tp: int) -> TpPlan:
    # probe the first layer carrying each block: hybrid stacks (jamba,
    # qwen3next, falcon-h1) interleave recurrent layers whose dicts have no
    # wq/ffn keys — the attention/FFN/MoE layers still shard by key name
    layers = params["layers"]
    layer0 = next((l for l in layers if "wq" in l), layers[0] if layers else {})
    ffn0 = next((l for l in layers if "ffn_down" in l), layer0)
    moe0 = next((l for l in layers if "ffn_gate_exps" in l), layer0)
    attn = (
        cfg.n_heads % tp == 0
        and cfg.n_kv_heads % tp == 0
        and all(isinstance(layer0.get(k), QTensor) or hasattr(layer0.get(k), "ndim")
                for k in ("wq", "wk", "wv", "wo"))
        and _k_shardable(layer0.get("wo"), tp)
        and _n_shardable(layer0["wq"], tp)
        and _n_shardable(layer0["wk"], tp)
    )
    ffn = (
        "ffn_down" in ffn0
        and "ffn_gate" in ffn0
        and cfg.n_ff % tp == 0
        and _k_shardable(ffn0["ffn_down"], tp)
        and _n_shardable(ffn0["ffn_gate"], tp)
    )
    vocab = isinstance(params["output"], QTensor) and _n_shardable(params["output"], tp)
    moe = (
        "ffn_gate_exps" in moe0
        and cfg.moe is not None
        and cfg.moe.n_experts % tp == 0
    )
    return TpPlan(attn=attn, kv=attn, ffn=ffn, vocab=vocab, moe=moe)


def _flag_and_spec(key: str, w, plan: TpPlan):
    """-> (possibly flag-carrying weight, PartitionSpec)."""
    if key in ("wq", "wk", "wv") and plan.attn:
        return w, P(None, "tp")
    if key in ("bq", "bk", "bv") and plan.attn:
        return w, P("tp")
    if key == "wo" and plan.attn:
        return w.with_collectives(psum_axis="tp"), P("tp", None)
    if key in ("ffn_gate", "ffn_up") and plan.ffn:
        return w, P(None, "tp")
    if key == "ffn_down" and plan.ffn:
        return w.with_collectives(psum_axis="tp"), P("tp", None)
    if key == "output" and plan.vocab:
        return w.with_collectives(gather_axis="tp"), P(None, "tp")
    if key.endswith("_exps") and not key.endswith("_chexps") and plan.moe:
        # expert parallelism: E axis (leading, on every plane) over tp.
        # grovemoe chunk stacks (*_chexps) stay replicated — they are tiny
        # (n_ff_chexp ~ head_dim) and run dense (models/llama.py
        # _grove_adjugate)
        return w, P("tp")
    return w, P()


def shard_params(params, mesh: Mesh, cfg):
    """Attach collective flags, compute per-leaf shardings, device_put.
    Returns (sharded_params, leaf_spec_tree, plan)."""
    # undo the load-time npack byte layout (an N-shard of the packed plane
    # would pair nibbles across shard boundaries, quant/repack.to_npack)
    # and the Q4_K diet scale layout (its [K//256, N] super planes can't
    # split on K boundaries that aren't multiples of 256*tp — the derived
    # fp16 a/b planes shard like any other format's)
    from ..quant.repack import from_npack, q4k_to_ab

    params = jax.tree_util.tree_map(
        lambda w: q4k_to_ab(from_npack(w)) if isinstance(w, QTensor) else w,
        params, is_leaf=lambda w: isinstance(w, (QTensor, QTensorE)),
    )
    # undo the load-time projection fusion: wq/wk/wv (and gate/up) shard on
    # different head boundaries, so TP operates on the separate weights
    if any("wqkv" in layer or "ffn_gateup" in layer for layer in params["layers"]):
        from ..models.loader import unfuse_projections

        params = unfuse_projections(params, cfg)
    tp = mesh.shape["tp"]
    plan = plan_for(cfg, params, tp)

    flagged = {"layers": []}
    specs = {"layers": []}
    for key, val in params.items():
        if key == "layers":
            continue
        w, s = _flag_and_spec(key, val, plan)
        flagged[key] = w
        specs[key] = s
    for layer in params["layers"]:
        fl, sl = {}, {}
        for key, val in layer.items():
            w, s = _flag_and_spec(key, val, plan)
            fl[key] = w
            sl[key] = s
        flagged["layers"].append(fl)
        specs["layers"].append(sl)

    leaf_specs = _expand_qtensor_specs(flagged, specs)
    put = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), flagged, leaf_specs
    )
    return put, leaf_specs, plan


def _expand_qtensor_specs(params, specs):
    """Per-tensor specs -> per-leaf specs (all planes of a QTensor share
    its spec, matching the pytree structure for shard_map in_specs)."""

    def expand(value, spec):
        if isinstance(value, QTensor):
            return QTensor(
                fmt=value.fmt, shape=value.shape, fold=value.fold,
                psum_axis=value.psum_axis, gather_axis=value.gather_axis,
                planes={k: spec for k in value.planes},
            )
        if isinstance(value, QTensorE):
            return QTensorE(
                fmt=value.fmt, shape=value.shape, fold=value.fold,
                planes={k: spec for k in value.planes},
            )
        return spec

    return jax.tree_util.tree_map(
        expand, params, specs,
        is_leaf=lambda x: isinstance(x, (QTensor, QTensorE, P)),
    )


def kv_spec(plan: TpPlan, mesh: Mesh | None = None, kv=None):
    """KV cache leaves (per-layer [B, H, S, D]): batch over the data axes
    (("dcn","dp") on hybrid multi-host meshes), kv-heads over tp; one spec
    serves every leaf of the KVCache pytree.

    Paged caches (`kv` a PagedKVCache) get a per-leaf spec pytree instead:
    page pools [Hkv, D, P*ps] shard their head axis over tp (the same axis
    the contiguous stripe shards) while the page table stays replicated —
    page indices are logical, so prefix sharing and CoW page surgery work
    unchanged under TP.  Pools hold every slot's pages, so the batch (dp)
    axis cannot shard a paged cache (callers gate dp>1 to contiguous)."""
    from ..runtime.paged import PagedKVCache

    if isinstance(kv, PagedKVCache):
        n = kv.n_layers
        pool = P("tp" if plan.kv else None, None, None)
        leaves = [pool] * (2 * n) + [P(None, None)]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(kv), leaves)
    baxes = _batch_axes(mesh)
    return P(baxes, "tp" if plan.kv else None, None, None)


def _batch_axes(mesh: Mesh | None):
    if mesh is None:
        return "dp"
    from .dist import batch_axes

    axes = batch_axes(mesh)
    return axes if len(axes) > 1 else (axes[0] if axes else None)


def sharded_forward_fn(cfg, mesh: Mesh, leaf_specs, plan: TpPlan, *, with_kv: bool = True,
                       logits_for="all", replicate_logits: bool = False,
                       with_stats: bool = False, kv_tree=None):
    """Jitted shard_map forward: (params, tokens, positions[, kv]) ->
    (logits, kv[, stats]) | logits.  Batch shards over dp; activations
    replicate over tp; weight collectives fire inside linear().

    replicate_logits: all-gather the batch-sharded logits inside the
    shard_map so every process holds the full tensor — required by the
    multi-host coordinated engine, whose rank-0 slot machine samples all
    rows but only addresses its local shards.

    with_stats: additionally return the per-step EP capacity-drop count
    (int32 scalar, replicated) so the serving engine can surface silent
    GShard drops as a metric."""
    from ..models.llama import forward

    data_spec = P(_batch_axes(mesh), None)
    ep = "tp" if plan.moe else None
    baxes = _batch_axes(mesh)
    with_stats = with_stats and plan.moe

    if with_kv:
        def fn(params, tokens, positions, kv):
            stats = {} if with_stats else None
            logits, kv = forward(params, cfg, tokens, positions, kv,
                                 logits_for=logits_for, ep_axis=ep, stats=stats)
            if replicate_logits:
                logits = jax.lax.all_gather(logits, baxes, axis=0, tiled=True)
            if with_stats:
                # drops are already psum'd over the ep axis; sum over the
                # batch axes for a fully-replicated global count
                dropped = stats.get("ep_dropped", jnp.zeros((), jnp.int32))
                if baxes:
                    dropped = jax.lax.psum(dropped, baxes)
                return logits, kv, dropped
            return logits, kv

        lspec = P(None, None, None) if replicate_logits else P(baxes, None, None)
        kspec = kv_spec(plan, mesh, kv_tree)
        out_specs = (lspec, kspec) + ((P(),) if with_stats else ())
        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(leaf_specs, data_spec, data_spec, kspec),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(3,))

    def fn2(params, tokens, positions):
        return forward(params, cfg, tokens, positions, None, logits_for=logits_for, ep_axis=ep)[0]

    mapped = jax.shard_map(
        fn2, mesh=mesh,
        in_specs=(leaf_specs, data_spec, data_spec),
        out_specs=P(_batch_axes(mesh), None, None),
        check_vma=False,
    )
    return jax.jit(mapped)
