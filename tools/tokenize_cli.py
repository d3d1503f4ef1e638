"""Tokenize a prompt and print ids/pieces (reference: tools/tokenize)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="GGUF with a tokenizer (vocab-only works)")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--ids", action="store_true", help="print bare ids only")
    ap.add_argument("--no-bos", action="store_true")
    ap.add_argument("--no-parse-special", action="store_true")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args()

    from zllm.gguf import read_gguf
    from zllm.tokenizer import Tokenizer

    text = args.prompt
    if text is None and args.file:
        text = open(args.file, encoding="utf-8").read()
    if text is None:
        text = sys.stdin.read()

    tok = Tokenizer.from_gguf(read_gguf(args.model))
    ids = tok.encode(text, add_special=not args.no_bos,
                     parse_special=not args.no_parse_special)
    if args.ids:
        print(ids)
    else:
        for i in ids:
            piece = tok.vocab.tokens[i]
            print(f"{i:>8} -> '{piece}'")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}", file=sys.stderr)


if __name__ == "__main__":
    main()
