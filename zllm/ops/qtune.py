"""Per-shape tile selection for the fused quantized matmul kernels.

The decode matvec is HBM-bound, but the achieved bandwidth swings 2-4x
with the (TN, TK) tiling: too-small tiles pay per-grid-step overhead
(~0.3us/step) and short-burst DMA; too-large tiles overflow VMEM's
double-buffering budget.  The optimum is shape-specific and flat enough
that a small measured table + a byte-budget heuristic covers it (the
reference hand-tunes the same space per GPU arch with template
specializations, ggml/src/ggml-cuda/mmq.cuh launch configs).

Selection order:
  1. `.cache/qmm_tiles.json` written by tools/tune_tiles.py (on-device
     autotune sweep), keyed "FMT,K,N" -> [tn, tk].
  2. builtin table of shapes measured on TPU v5e (tools/exp_tiles.py).
  3. heuristic: largest qs-plane tile <= _TILE_CAP bytes with >= 4 grid
     steps for DMA/compute pipelining.

ZLLM_QMM_TN / ZLLM_QMM_TK_MULT env knobs still override everything (they
are read by the callers before consulting this module).
"""

from __future__ import annotations

import json
import os

# measured on TPU v5e, tools/exp_tiles.py + /tmp A/B sweeps, 2026-08
# value: (tn, tk, fuse_act_quant); fuse=1 quantizes activations in-kernel
_BUILTIN: dict[tuple[str, int, int], tuple[int, int, int]] = {
    ("Q4_K", 2048, 2560): (2560, 256, 1),  # 70%
    ("Q4_K", 2048, 2048): (1024, 1024, 1),  # 79%
    ("Q4_K", 2048, 11264): (11264, 256, 1),  # 84%
    ("Q4_K", 5632, 2048): (2048, 512, 1),  # 66%
    ("Q4_K", 2048, 32768): (8192, 512, 0),  # 95%; fused loses at 4x4 grid
}

_TILE_CAP = 2 * 1024 * 1024  # qs-plane bytes per tile (double-buffered in VMEM)

_table: dict[tuple[str, int, int], tuple[int, int]] | None = None


def _cache_path() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.environ.get(
        "ZLLM_QMM_TILES", os.path.join(repo, ".cache", "qmm_tiles.json")
    )


def _load() -> dict:
    global _table
    if _table is None:
        _table = dict(_BUILTIN)
        try:
            with open(_cache_path()) as fh:
                for key, val in json.load(fh).items():
                    fmt, k, n = key.split(",")
                    tn, tk = int(val[0]), int(val[1])
                    fuse = int(val[2]) if len(val) > 2 else 1
                    _table[(fmt, int(k), int(n))] = (tn, tk, fuse)
        except (OSError, ValueError):
            pass
    return _table


def save(entries: dict[tuple[str, int, int], tuple]) -> str:
    """Merge autotuned entries into the on-disk table (tools/tune_tiles.py)."""
    global _table
    path = _cache_path()
    data = {}
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        pass
    for (fmt, k, n), val in entries.items():
        data[f"{fmt},{k},{n}"] = [int(v) for v in val]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    _table = None  # force reload
    return path


def candidates(k: int, n: int, fold: int, qs_kdiv: int = 2):
    """Feasible (tn, tk) grid for the autotuner, VMEM-capped."""
    tns = [t for t in (128, 256, 512, 1024, 2048, 4096, 8192, n) if n % t == 0]
    tks = [fold * m for m in (1, 2, 4, 8) if k % (fold * m) == 0]
    out = []
    for tn in dict.fromkeys(tns):
        for tk in tks:
            if (tk // qs_kdiv) * tn <= _TILE_CAP:
                out.append((tn, tk))
    return out


def lookup(
    fmt_name: str, k: int, n: int, fold: int, qs_kdiv: int = 2, prologue: str = "q"
) -> tuple[int, int, int]:
    """Best-known (tn, tk, fuse_act_quant) for this matvec shape.

    `prologue` tags the kernel variant ("q" in-kernel act quant, "norm"
    fused RMS-norm, "glu" fused SwiGLU): a table entry measured for the
    exact variant wins; otherwise the plain-"q" entry is a close proxy
    (the prologue adds VPU work but identical DMA traffic)."""
    table = _load()
    if prologue != "q":
        hit = table.get((f"{fmt_name}:{prologue}", k, n))
        if hit is not None:
            return hit if len(hit) == 3 else (*hit, 1)
    hit = table.get((fmt_name, k, n))
    if hit is not None:
        return hit if len(hit) == 3 else (*hit, 1)
    # heuristic: largest qs tile under the cap, keeping >= 4 grid steps
    best, best_score = None, None
    for tn, tk in candidates(k, n, fold, qs_kdiv):
        tile = (tk // qs_kdiv) * tn
        steps = (n // tn) * (k // tk)
        if steps < 4 and (n // tn) * (k // tk) != (n * k) // (tn * tk):
            continue
        # prefer big tiles; soft-penalize step counts outside [4, 32]
        score = tile - (0 if 4 <= steps <= 32 else tile // 4)
        if best_score is None or score > best_score:
            best, best_score = (tn, tk), score
    if best is None:
        best = (min(n, 128), fold)
    # in-kernel act quant wins unless the N-grid replays it many times
    return (*best, 1 if n // best[0] <= 2 else 0)
