"""Batched on-device sampler chain for the serving engine.

One jitted call samples every slot's next token with per-slot parameters
(struct-of-arrays), replacing a host-side per-slot numpy loop.  The chain
order and semantics follow the reference's common/sampling.cpp defaults:
penalties -> top-k -> typical -> top-p -> min-p -> top-n-sigma -> xtc ->
temperature -> categorical (temp <= 0 degenerates to greedy, reference
behavior).  Per-slot RNG keys keep per-request seeds reproducible under
continuous batching.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass
class SlotParams:
    """Host-side per-slot sampling parameters (numpy struct-of-arrays)."""

    n: int
    temp: np.ndarray = field(default=None)
    top_k: np.ndarray = field(default=None)
    top_p: np.ndarray = field(default=None)
    min_p: np.ndarray = field(default=None)
    typical_p: np.ndarray = field(default=None)
    top_n_sigma: np.ndarray = field(default=None)
    xtc_probability: np.ndarray = field(default=None)
    xtc_threshold: np.ndarray = field(default=None)
    repeat_penalty: np.ndarray = field(default=None)
    freq_penalty: np.ndarray = field(default=None)
    presence_penalty: np.ndarray = field(default=None)
    dry_multiplier: np.ndarray = field(default=None)
    dry_base: np.ndarray = field(default=None)
    dry_allowed_length: np.ndarray = field(default=None)
    dynatemp_range: np.ndarray = field(default=None)
    dynatemp_exponent: np.ndarray = field(default=None)
    mirostat: np.ndarray = field(default=None)
    mirostat_tau: np.ndarray = field(default=None)
    mirostat_eta: np.ndarray = field(default=None)

    def __post_init__(self):
        n = self.n
        defaults = dict(
            temp=0.8, top_k=40, top_p=0.95, min_p=0.05, typical_p=1.0,
            top_n_sigma=0.0, xtc_probability=0.0, xtc_threshold=0.1,
            repeat_penalty=1.0, freq_penalty=0.0, presence_penalty=0.0,
            dry_multiplier=0.0, dry_base=1.75, dry_allowed_length=2.0,
            dynatemp_range=0.0, dynatemp_exponent=1.0,
            mirostat=0.0, mirostat_tau=5.0, mirostat_eta=0.1,
        )
        for k, v in defaults.items():
            if getattr(self, k) is None:
                setattr(self, k, np.full((n,), v, np.float32))

    def set_slot(self, i: int, req) -> None:
        """Copy one request's sampling params into row i."""
        self.temp[i] = req.temp
        self.top_k[i] = req.top_k
        self.top_p[i] = req.top_p
        self.min_p[i] = req.min_p
        self.typical_p[i] = getattr(req, "typical_p", 1.0)
        self.top_n_sigma[i] = getattr(req, "top_n_sigma", 0.0)
        self.xtc_probability[i] = getattr(req, "xtc_probability", 0.0)
        self.xtc_threshold[i] = getattr(req, "xtc_threshold", 0.1)
        self.repeat_penalty[i] = req.repeat_penalty
        self.freq_penalty[i] = getattr(req, "freq_penalty", 0.0)
        self.presence_penalty[i] = getattr(req, "presence_penalty", 0.0)
        self.dry_multiplier[i] = getattr(req, "dry_multiplier", 0.0)
        self.dry_base[i] = getattr(req, "dry_base", 1.75)
        self.dry_allowed_length[i] = getattr(req, "dry_allowed_length", 2)
        self.dynatemp_range[i] = getattr(req, "dynatemp_range", 0.0)
        self.dynatemp_exponent[i] = getattr(req, "dynatemp_exponent", 1.0)
        self.mirostat[i] = getattr(req, "mirostat", 0)
        self.mirostat_tau[i] = getattr(req, "mirostat_tau", 5.0)
        self.mirostat_eta[i] = getattr(req, "mirostat_eta", 0.1)
        if self.mirostat[i] > 0:
            # mirostat replaces the truncation stack (reference
            # common/sampling.cpp: mirostat chain is penalties -> temp ->
            # mirostat; top-k/p/etc. are not instantiated)
            self.top_k[i] = 0
            self.top_p[i] = 1.0
            self.min_p[i] = 0.0
            self.typical_p[i] = 1.0
            self.top_n_sigma[i] = 0.0
            self.xtc_probability[i] = 0.0

    def arrays(self) -> tuple:
        return (
            self.temp, self.top_k, self.top_p, self.min_p, self.typical_p,
            self.top_n_sigma, self.xtc_probability, self.xtc_threshold,
            self.repeat_penalty, self.freq_penalty, self.presence_penalty,
            self.dry_multiplier, self.dry_base, self.dry_allowed_length,
            self.dynatemp_range, self.dynatemp_exponent,
            self.mirostat, self.mirostat_tau, self.mirostat_eta,
        )


def _penalties_b(lg, recent, repeat, freq, presence):
    """recent: int32 [B, W], -1 = empty."""
    b, vocab = lg.shape
    valid = recent >= 0
    idx = jnp.where(valid, recent, 0)
    counts = jnp.zeros((b, vocab), jnp.float32)
    counts = jax.vmap(lambda c, i, v: c.at[i].add(v))(counts, idx, valid.astype(jnp.float32))
    present = counts > 0
    rp = repeat[:, None]
    pen = jnp.where(lg > 0, lg / rp, lg * rp)
    out = jnp.where(present & (rp != 1.0), pen, lg)
    out = out - counts * freq[:, None] - present.astype(jnp.float32) * presence[:, None]
    return out


def _top_k_b(lg, k):
    vocab = lg.shape[-1]
    srt = jnp.sort(lg, axis=-1)[:, ::-1]  # desc
    kidx = jnp.clip(k.astype(jnp.int32) - 1, 0, vocab - 1)
    kth = jnp.take_along_axis(srt, kidx[:, None], axis=-1)
    return jnp.where((k[:, None] > 0) & (lg < kth), NEG_INF, lg)


def _top_p_b(lg, p):
    srt = jnp.sort(lg, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(srt, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < p[:, None]
    n_keep = jnp.maximum(jnp.sum(keep, axis=-1), 1)
    cutoff = jnp.take_along_axis(srt, (n_keep - 1)[:, None], axis=-1)
    return jnp.where((p[:, None] < 1.0) & (lg < cutoff), NEG_INF, lg)


def _min_p_b(lg, p):
    mx = jnp.max(lg, axis=-1, keepdims=True)
    thr = mx + jnp.log(jnp.maximum(p[:, None], 1e-10))
    return jnp.where((p[:, None] > 0) & (lg < thr), NEG_INF, lg)


def _typical_b(lg, p):
    probs = jax.nn.softmax(lg, axis=-1)
    logp = jnp.log(probs + 1e-30)
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sp, axis=-1)
    keep_sorted = cum - sp < p[:, None]
    n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    rank = jnp.argsort(order, axis=-1)
    masked = jnp.where(rank < n_keep[:, None], lg, NEG_INF)
    return jnp.where(p[:, None] < 1.0, masked, lg)


def _top_n_sigma_b(lg, n):
    valid = lg > NEG_INF / 2
    cnt = jnp.sum(valid, axis=-1, keepdims=True)
    mean = jnp.sum(jnp.where(valid, lg, 0), axis=-1, keepdims=True) / cnt
    var = jnp.sum(jnp.where(valid, (lg - mean) ** 2, 0), axis=-1, keepdims=True) / cnt
    mx = jnp.max(lg, axis=-1, keepdims=True)
    thr = mx - n[:, None] * jnp.sqrt(var)
    return jnp.where((n[:, None] > 0) & (lg < thr), NEG_INF, lg)


def _xtc_b(lg, prob, thr, keys):
    probs = jax.nn.softmax(lg, axis=-1)
    above = probs > thr[:, None]
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    least = jnp.min(jnp.where(above, probs, jnp.inf), axis=-1, keepdims=True)
    cut = above & (probs > least)
    masked = jnp.where(cut, NEG_INF, lg)
    coin = jax.vmap(lambda k: jax.random.uniform(k))(keys)
    apply = (coin[:, None] < prob[:, None]) & (n_above >= 2)
    return jnp.where(apply, masked, lg)


def _dry_b(lg, recent, mult, base, allowed, br_mask):
    """DRY (don't-repeat-yourself) repetition penalty (reference:
    llama_sampler_init_dry, src/llama-sampling.cpp): a candidate token z
    that would extend an earlier occurrence of the current context suffix
    is penalized mult * base^(n - allowed) where n is the matched suffix
    length.  O(W^2) suffix-match over the recent window, fully in-jit;
    `br_mask` is a [V] bool sequence-breaker table (tokens whose text
    contains a breaker substring terminate matches)."""
    b, w = recent.shape
    valid = recent >= 0
    z = jnp.where(valid, recent, 0)
    is_br = br_mask[z] & valid  # [B, W]

    t_idx = jnp.arange(w)
    jm = jnp.arange(w)[:, None] - 1 - t_idx[None, :]  # [W(j), W(t)]
    wm = w - 1 - t_idx  # [W(t)]
    ok = jm >= 0
    a = recent[:, jnp.clip(jm, 0, w - 1)]  # [B, W, W]
    c = recent[:, wm]  # [B, W]
    abr = is_br[:, jnp.clip(jm, 0, w - 1)]
    cbr = is_br[:, wm]
    eq = (
        ok[None]
        & (a == c[:, None, :]) & (a >= 0) & (c[:, None, :] >= 0)
        & ~abr & ~cbr[:, None, :]
    )
    run = jnp.cumprod(eq.astype(jnp.int32), axis=-1)
    n_match = jnp.sum(run, axis=-1).astype(jnp.float32)  # [B, W]

    ncap = jnp.minimum(n_match, 48.0)  # cap the exponent (reference caps too)
    pen_j = mult[:, None] * jnp.power(jnp.maximum(base[:, None], 1.0), ncap - allowed[:, None])
    pen_j = jnp.where(
        (n_match >= allowed[:, None]) & valid & ~is_br & (mult[:, None] > 0), pen_j, 0.0
    )
    pen = jax.vmap(lambda p, zz, pj: p.at[zz].max(pj))(jnp.zeros_like(lg), z, pen_j)
    return lg - pen


def _temperature_b(lg, temp, dt_range, dt_expo):
    # dynamic temperature (reference llama_sampler_init_temp_ext): scale
    # temp within [temp-range, temp+range] by normalized candidate entropy
    valid = lg > NEG_INF / 2
    probs = jax.nn.softmax(jnp.where(valid, lg, NEG_INF), axis=-1)
    ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs + 1e-30), 0.0), axis=-1)
    max_ent = jnp.log(jnp.maximum(jnp.sum(valid, axis=-1).astype(jnp.float32), 2.0))
    norm = jnp.clip(ent / max_ent, 0.0, 1.0) ** jnp.maximum(dt_expo, 1e-3)
    lo = jnp.maximum(temp - dt_range, 0.0)
    hi = temp + dt_range
    t_eff = jnp.where(dt_range > 0, lo + (hi - lo) * norm, temp)

    # temp <= 0 is greedy: a one-hot on the FIRST argmax so the categorical
    # draw is key-independent (the reference's greedy sampler is fully
    # deterministic; masking *all* tied maxima would tie-break by RNG)
    amax = jnp.argmax(lg, axis=-1)
    iota = jnp.arange(lg.shape[-1])[None, :]
    greedy = jnp.where(iota == amax[:, None], 0.0, NEG_INF)
    return jnp.where(t_eff[:, None] <= 0, greedy, lg / jnp.maximum(t_eff[:, None], 1e-6))


LOG2E = 1.4426950408889634


@jax.jit
def sample_batch(
    logits: jax.Array,  # [B, V] f32
    keys: jax.Array,  # [B, 2] uint32 per-slot PRNG keys
    recent: jax.Array,  # [B, W] int32 recent tokens (-1 empty)
    br_mask: jax.Array,  # [V] bool DRY sequence-breaker table
    mu: jax.Array,  # [B] f32 mirostat-v2 state (2*tau at request start)
    temp, top_k, top_p, min_p, typical_p, top_n_sigma,
    xtc_probability, xtc_threshold, repeat_penalty, freq_penalty, presence_penalty,
    dry_multiplier, dry_base, dry_allowed_length, dynatemp_range, dynatemp_exponent,
    mirostat, mirostat_tau, mirostat_eta,
):
    """Returns (tokens [B] int32, probs_logits [B, V] post-chain, new_keys,
    new_mu).  Grammar-constrained rows arrive with the grammar mask already
    folded into `logits` (engine resample pass), so the full chain applies
    to constrained requests too (reference chain-with-grammar ordering,
    src/llama-sampling.cpp)."""
    lg = logits.astype(jnp.float32)
    lg = _penalties_b(lg, recent, repeat_penalty, freq_penalty, presence_penalty)
    lg = _dry_b(lg, recent, dry_multiplier, dry_base, dry_allowed_length, br_mask)
    lg = _top_k_b(lg, top_k)
    lg = _typical_b(lg, typical_p)
    lg = _top_p_b(lg, top_p)
    lg = _min_p_b(lg, min_p)
    lg = _top_n_sigma_b(lg, top_n_sigma)
    split = jax.vmap(jax.random.split)(keys)  # [B, 2, 2]
    new_keys, sub = split[:, 0], split[:, 1]
    xtc_keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(sub, 1)
    lg = _xtc_b(lg, xtc_probability, xtc_threshold, xtc_keys)
    lg = _temperature_b(lg, temp, dynatemp_range, dynatemp_exponent)

    # mirostat v2 (reference llama_sampler_init_mirostat_v2): drop candidates
    # whose surprise -log2 p exceeds mu (always keeping the argmax), sample,
    # then servo mu toward the target surprise tau
    act = mirostat > 0
    probs = jax.nn.softmax(lg, axis=-1)
    surprise = -jnp.log(jnp.maximum(probs, 1e-30)) * LOG2E
    amax = jnp.argmax(lg, axis=-1)
    iota = jnp.arange(lg.shape[-1])[None, :]
    keep = (surprise <= mu[:, None]) | (iota == amax[:, None])
    lg = jnp.where(act[:, None] & ~keep, NEG_INF, lg)

    toks = jax.vmap(jax.random.categorical)(sub, lg).astype(jnp.int32)

    p_tok = jnp.take_along_axis(jax.nn.softmax(lg, axis=-1), toks[:, None], axis=-1)[:, 0]
    s_obs = -jnp.log(jnp.maximum(p_tok, 1e-30)) * LOG2E
    new_mu = jnp.where(act, mu - mirostat_eta * (s_obs - mirostat_tau), mu)
    return toks, lg, new_keys, new_mu


def breaker_mask(tokenizer, vocab_size: int, breakers=("\n", ":", "\"", "*")) -> np.ndarray:
    """[V] bool: tokens whose decoded piece contains a DRY sequence
    breaker (reference default breakers, common/sampling.cpp)."""
    mask = np.zeros((vocab_size,), bool)
    if tokenizer is None:
        return mask
    try:
        pieces = tokenizer.vocab.tokens
    except AttributeError:
        return mask
    for i, piece in enumerate(pieces[:vocab_size]):
        if any(b in piece for b in breakers):
            mask[i] = True
    return mask


def make_keys(seeds) -> jax.Array:
    """[B] int seeds -> [B, 2] uint32 PRNG keys."""
    return jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
