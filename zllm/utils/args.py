"""Shared CLI argument system with environment fallbacks and presets.

The analogue of the reference's common/arg.cpp (+ preset.cpp): every
common flag has a ZLLM_ARG_* environment fallback (reference: LLAMA_ARG_*
envs, common/arg.cpp) and --preset loads an INI section of defaults
(reference: tools/server --models-preset / common presets), with
precedence CLI > env > preset > default.
"""

from __future__ import annotations

import argparse
import configparser
import os


class EnvDefault(argparse.Action):
    """argparse action resolving ZLLM_ARG_<NAME> when the flag is absent."""

    def __init__(self, option_strings, dest, envvar=None, required=False, default=None, **kw):
        envvar = envvar or "ZLLM_ARG_" + dest.upper()
        if envvar in os.environ:
            default = os.environ[envvar]
            required = False
        self.envvar = envvar
        super().__init__(option_strings, dest, default=default, required=required, **kw)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, values)


def add_common_args(ap: argparse.ArgumentParser, *, server: bool = False):
    """The common flag set shared by the tools (reference common_params)."""
    ap.add_argument("--preset", default=os.environ.get("ZLLM_ARG_PRESET", ""),
                    help="INI preset file (or file:section) of flag defaults")
    ap.add_argument("--ctx", "-c", action=EnvDefault, type=int, default=2048,
                    help="context length [ZLLM_ARG_CTX]")
    ap.add_argument("--dense", action="store_true",
                    default=os.environ.get("ZLLM_ARG_DENSE", "") == "1",
                    help="dequantize weights at load [ZLLM_ARG_DENSE=1]")
    ap.add_argument("--seed", action=EnvDefault, type=int, default=-1,
                    help="RNG seed [ZLLM_ARG_SEED]")
    if server:
        ap.add_argument("--host", action=EnvDefault, default="127.0.0.1",
                        help="[ZLLM_ARG_HOST]")
        ap.add_argument("--port", action=EnvDefault, type=int, default=8080,
                        help="[ZLLM_ARG_PORT]")
        ap.add_argument("--slots", "-np", action=EnvDefault, type=int, default=4,
                        help="parallel slots [ZLLM_ARG_SLOTS]")
    return ap


def apply_preset(ap: argparse.ArgumentParser, args: argparse.Namespace) -> argparse.Namespace:
    """Fill still-default values from the --preset INI (CLI and env win)."""
    spec = getattr(args, "preset", "")
    if not spec:
        return args
    path, _, section = spec.partition(":")
    cp = configparser.ConfigParser()
    if not cp.read(path):
        raise FileNotFoundError(f"preset file {path!r} not found")
    sect = cp[section or cp.sections()[0]]
    defaults = {a.dest: a.default for a in ap._actions}
    for key, value in sect.items():
        dest = key.replace("-", "_")
        if not hasattr(args, dest):
            continue
        if getattr(args, dest) != defaults.get(dest):
            continue  # explicitly set via CLI or env: preset loses
        cur = defaults.get(dest)
        if isinstance(cur, bool):
            value = value.lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int):
            value = int(value)
        elif isinstance(cur, float):
            value = float(value)
        setattr(args, dest, value)
    return args


def parse_with_presets(ap: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    args = ap.parse_args(argv)
    return apply_preset(ap, args)
