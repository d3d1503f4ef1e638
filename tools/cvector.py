"""Control-vector generator (reference: tools/cvector-generator): run
positive/negative prompt pairs, collect per-layer hidden-state
differences at the last token, and reduce each layer's diff set to one
direction (mean or top principal component).  Output GGUF carries
direction.{il} tensors consumed by zllm.models.adapter.load_cvector."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(model, positives: list[str], negatives: list[str], method: str = "pca"):
    """-> dict il -> direction [n_embd] f32 (layer 0 excluded, like the
    reference which starts at il_start=1)."""
    import jax.numpy as jnp

    from zllm.models.llama import forward

    cfg = model.cfg
    tok = model.tokenizer

    def hiddens(text):
        ids = tok.encode(text, add_special=True)
        toks = jnp.asarray(np.asarray(ids, np.int32)[None])
        pos = jnp.asarray(np.arange(len(ids), dtype=np.int32)[None])
        taps = {}
        forward(model.params, cfg, toks, pos, None, taps=taps)
        return {
            il: np.asarray(taps[f"blk.{il}.l_out"])[0, -1]  # last token
            for il in range(cfg.n_layers)
        }

    diffs: dict[int, list[np.ndarray]] = {il: [] for il in range(cfg.n_layers)}
    for p, n in zip(positives, negatives):
        hp, hn = hiddens(p), hiddens(n)
        for il in range(cfg.n_layers):
            diffs[il].append(hp[il].astype(np.float32) - hn[il].astype(np.float32))

    out = {}
    for il in range(1, cfg.n_layers):
        d = np.stack(diffs[il])  # [n_pairs, K]
        if method == "mean" or d.shape[0] == 1:
            v = d.mean(axis=0)
        else:  # top principal component, sign-aligned with the mean diff
            dc = d - d.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(dc, full_matrices=False)
            v = vt[0]
            if np.dot(v, d.mean(axis=0)) < 0:
                v = -v
            v = v * np.linalg.norm(d.mean(axis=0))
        out[il] = v.astype(np.float32)
    return out


def write_cvector_gguf(directions: dict, out_path: str, model_hint: str = "llama"):
    from zllm.gguf.writer import GGUFWriter

    w = GGUFWriter(out_path)
    w.add("general.architecture", "controlvector")
    w.add("controlvector.model_hint", model_hint)
    w.add("controlvector.layer_count", len(directions))
    for il, v in sorted(directions.items()):
        w.add_tensor(f"direction.{il}", v.astype(np.float32))
    w.write()
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--positive-file", required=True, help="one prompt per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--method", default="pca", choices=["pca", "mean"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from zllm.models.loader import Model

    m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
    pos = [l for l in open(args.positive_file, encoding="utf-8").read().splitlines() if l]
    neg = [l for l in open(args.negative_file, encoding="utf-8").read().splitlines() if l]
    dirs = generate(m, pos, neg, args.method)
    write_cvector_gguf(dirs, args.output, m.cfg.arch)
    print(f"wrote {args.output} ({len(dirs)} layers)")


if __name__ == "__main__":
    main()
