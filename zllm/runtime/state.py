"""Session / sequence state (de)serialization.

The counterpart of the reference's state I/O (reference:
src/llama-context.cpp:2342-2692 llama_state_save_file / load_file with
LLAMA_SESSION_MAGIC, and per-sequence llama_state_seq_get/set_data used
by the server's /slots save-restore and prompt cache): KV-cache contents
plus positions/tokens, whole-context or per-sequence, written as a
self-describing .npz with a JSON header.
"""

from __future__ import annotations

import json

import numpy as np

MAGIC = "ZLLMSESS"
VERSION = 1


def _to_np(a) -> np.ndarray:
    """Device array -> npz-storable numpy (bfloat16 has no numpy dtype;
    store its bits as uint16 and record the real dtype in meta)."""
    a = np.asarray(a)
    if a.dtype.kind == "V" or str(a.dtype) == "bfloat16":
        return a.view(np.uint16)
    return a


def _from_np(a: np.ndarray, dtype_name: str) -> np.ndarray:
    if dtype_name == "bfloat16":
        import ml_dtypes

        return a.view(ml_dtypes.bfloat16)
    return a


def _meta(model, extra: dict) -> dict:
    cfg = model.cfg
    return {
        "magic": MAGIC,
        "version": VERSION,
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        **extra,
    }


def save_session(path: str, model, kv, tokens: list[int], n_past: int):
    """Whole-context session: trimmed KV + token history."""
    kv_dtype = str(np.asarray(kv.k[0][:1, :1, :1]).dtype)
    k = np.stack([_to_np(x[:, :, :n_past]) for x in kv.k])
    v = np.stack([_to_np(x[:, :, :n_past]) for x in kv.v])
    np.savez_compressed(
        path,
        meta=json.dumps(_meta(model, {"n_past": n_past, "kv_dtype": kv_dtype})),
        tokens=np.asarray(tokens, dtype=np.int32),
        k=k,
        v=v,
    )


def load_session(path: str, model, kv):
    """Restore into an existing cache (batch row 0). Returns (kv, tokens,
    n_past)."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC:
        raise ValueError(f"{path}: not a zllm session file")
    if meta["version"] > VERSION:
        raise ValueError(f"{path}: session version {meta['version']} > supported {VERSION}")
    for key in ("arch", "n_layers", "n_kv_heads", "head_dim"):
        want = getattr(model.cfg, key if key != "arch" else "arch")
        if meta[key] != want:
            raise ValueError(f"{path}: session {key}={meta[key]} does not match model {want}")
    n_past = int(meta["n_past"])
    if n_past > kv.max_len:
        raise ValueError(f"session length {n_past} exceeds cache {kv.max_len}")
    k = jnp.asarray(_from_np(data["k"], meta.get("kv_dtype", "")))
    v = jnp.asarray(_from_np(data["v"], meta.get("kv_dtype", "")))
    kv = type(kv)(
        k=tuple(x.at[:, :, :n_past].set(k[i].astype(x.dtype)) for i, x in enumerate(kv.k)),
        v=tuple(x.at[:, :, :n_past].set(v[i].astype(x.dtype)) for i, x in enumerate(kv.v)),
    )
    return kv, data["tokens"].tolist(), n_past


def seq_get(model, kv, seq: int, n_past: int) -> dict:
    """Extract one sequence's state (server /slots?action=save analogue).
    Works on both the contiguous cache and the paged cache (gathered
    through the slot's page table)."""
    from .paged import PagedKVCache

    if isinstance(kv, PagedKVCache):
        rows = [kv.gather_row(il, seq, n_past) for il in range(kv.n_layers)]
        kv_dtype = str(np.asarray(kv.k[0][:1, :1]).dtype)
        return {
            "meta": _meta(model, {"n_past": n_past, "kv_dtype": kv_dtype}),
            "k": np.stack([_to_np(k) for k, _ in rows]),
            "v": np.stack([_to_np(v) for _, v in rows]),
        }
    from .kvcache import KVCacheQ8

    if isinstance(kv, KVCacheQ8):
        # q8 states are stored dequantized (bf16) so a saved slot restores
        # into ANY cache type; seq_set requantizes on the way back in
        rows_k, rows_v = [], []
        for il in range(len(kv.k)):
            k, v = kv._deq(il)
            rows_k.append(_to_np(k[seq, :, :n_past]))
            rows_v.append(_to_np(v[seq, :, :n_past]))
        return {
            "meta": _meta(model, {"n_past": n_past, "kv_dtype": "bfloat16"}),
            "k": np.stack(rows_k),
            "v": np.stack(rows_v),
        }
    kv_dtype = str(np.asarray(kv.k[0][:1, :1, :1]).dtype)
    return {
        "meta": _meta(model, {"n_past": n_past, "kv_dtype": kv_dtype}),
        "k": np.stack([_to_np(x[seq, :, :n_past]) for x in kv.k]),
        "v": np.stack([_to_np(x[seq, :, :n_past]) for x in kv.v]),
    }


def seq_set(model, kv, seq: int, state: dict):
    """Install a sequence state into slot `seq`; returns (kv, n_past)."""
    import jax.numpy as jnp

    from .paged import PagedKVCache

    meta = state["meta"]
    n_past = int(meta["n_past"])
    dt = meta.get("kv_dtype", "")
    sk = jnp.asarray(_from_np(state["k"], dt))
    sv = jnp.asarray(_from_np(state["v"], dt))
    if isinstance(kv, PagedKVCache):
        for il in range(kv.n_layers):
            kv = kv.scatter_row(il, seq, sk[il], sv[il])
        return kv, n_past
    from .kvcache import KVCacheQ8

    if isinstance(kv, KVCacheQ8):
        k, v, kss, vss = list(kv.k), list(kv.v), list(kv.ks), list(kv.vs)
        for il in range(len(kv.k)):
            kq, ksc = KVCacheQ8._quant(sk[il][None])
            vq, vsc = KVCacheQ8._quant(sv[il][None])
            k[il] = kv.k[il].at[seq, :, :n_past].set(kq[0])
            kss[il] = kv.ks[il].at[seq, :, :n_past].set(ksc[0])
            v[il] = kv.v[il].at[seq, :, :n_past].set(vq[0])
            vss[il] = kv.vs[il].at[seq, :, :n_past].set(vsc[0])
        return KVCacheQ8(k=tuple(k), v=tuple(v), ks=tuple(kss), vs=tuple(vss)), n_past
    kv = type(kv)(
        k=tuple(x.at[seq, :, :n_past].set(sk[i].astype(x.dtype)) for i, x in enumerate(kv.k)),
        v=tuple(x.at[seq, :, :n_past].set(sv[i].astype(x.dtype)) for i, x in enumerate(kv.v)),
    )
    return kv, n_past


def seq_save_file(path: str, model, kv, seq: int, n_past: int):
    st = seq_get(model, kv, seq, n_past)
    with open(path, "wb") as fh:  # file object: savez must not append .npz
        np.savez_compressed(fh, meta=json.dumps(st["meta"]), k=st["k"], v=st["v"])


def seq_load_file(path: str, model, kv, seq: int):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC:
        raise ValueError(f"{path}: not a zllm state file")
    return seq_set(model, kv, seq, {"meta": meta, "k": data["k"], "v": data["v"]})
