"""Sampler chain.

The functional counterpart of the reference's vtable sampler chain
(reference: src/llama-sampling.cpp, llama_sampler_init_* family): each
sampler is a pure logits->logits transform (vocab-sized, jit-friendly) and
the chain terminates in a selection rule (greedy argmax or categorical
draw).  Chains run on-device inside the decode step; penalty state
(recent tokens) is carried by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def temperature(logits: jax.Array, temp: float) -> jax.Array:
    if temp <= 0:
        # greedy semantics: keep only the max (reference temp<=0 behavior)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        return jnp.where(logits == mx, logits, NEG_INF)
    return logits / temp


def top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus: keep the smallest set with cumulative prob >= p."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep = cum - probs < p
    n_keep = jnp.sum(keep, axis=-1)
    cutoff = jnp.take_along_axis(sorted_logits, jnp.maximum(n_keep - 1, 0)[..., None], axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def min_p(logits: jax.Array, p: float) -> jax.Array:
    """Drop tokens below p * max prob (reference llama_sampler_init_min_p)."""
    if p <= 0:
        return logits
    mx = jnp.max(logits, axis=-1, keepdims=True)
    # prob_i / prob_max = exp(l_i - l_max) >= p  <=>  l_i >= l_max + log p
    return jnp.where(logits < mx + jnp.log(p), NEG_INF, logits)


def typical(logits: jax.Array, p: float) -> jax.Array:
    """Locally-typical sampling (reference llama_sampler_init_typical)."""
    if p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jnp.log(probs + 1e-30)
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = cum - sorted_probs < p
    n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1), 1)
    rank = jnp.argsort(order, axis=-1)  # rank of each token in typicality order
    return jnp.where(rank < n_keep[..., None], logits, NEG_INF)


def top_n_sigma(logits: jax.Array, n: float) -> jax.Array:
    """Keep logits within n standard deviations of the max (reference
    llama_sampler_init_top_n_sigma)."""
    if n <= 0:
        return logits
    valid = logits > NEG_INF / 2
    cnt = jnp.sum(valid, axis=-1, keepdims=True)
    mean = jnp.sum(jnp.where(valid, logits, 0), axis=-1, keepdims=True) / cnt
    var = jnp.sum(jnp.where(valid, (logits - mean) ** 2, 0), axis=-1, keepdims=True) / cnt
    mx = jnp.max(logits, axis=-1, keepdims=True)
    return jnp.where(logits < mx - n * jnp.sqrt(var), NEG_INF, logits)


def xtc(logits: jax.Array, probability: float, threshold: float, key: jax.Array) -> jax.Array:
    """Exclude-top-choices (reference llama_sampler_init_xtc): with prob
    `probability`, remove all but the last token whose prob > threshold."""
    probs = jax.nn.softmax(logits, axis=-1)
    above = probs > threshold
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    # keep the *least* likely of the above-threshold tokens
    cut = jnp.where(above & (probs > jnp.min(jnp.where(above, probs, jnp.inf), axis=-1, keepdims=True)), True, False)
    masked = jnp.where(cut, NEG_INF, logits)
    coin = jax.random.uniform(key, logits.shape[:-1] + (1,))
    apply = (coin < probability) & (n_above >= 2)
    return jnp.where(apply, masked, logits)


def penalties(
    logits: jax.Array,
    recent_tokens: jax.Array,  # int32 [W] window of last tokens (-1 = empty)
    repeat_penalty: float = 1.0,
    freq_penalty: float = 0.0,
    presence_penalty: float = 0.0,
) -> jax.Array:
    """Repetition/frequency/presence penalties over a recent-token window
    (reference llama_sampler_init_penalties)."""
    if repeat_penalty == 1.0 and freq_penalty == 0.0 and presence_penalty == 0.0:
        return logits
    vocab = logits.shape[-1]
    valid = recent_tokens >= 0
    counts = jnp.zeros((vocab,), jnp.float32).at[jnp.where(valid, recent_tokens, 0)].add(
        valid.astype(jnp.float32)
    )
    present = counts > 0
    out = logits
    if repeat_penalty != 1.0:
        pen = jnp.where(out > 0, out / repeat_penalty, out * repeat_penalty)
        out = jnp.where(present, pen, out)
    out = out - counts * freq_penalty - present.astype(jnp.float32) * presence_penalty
    return out


def logit_bias(logits: jax.Array, tokens: jax.Array, biases: jax.Array) -> jax.Array:
    return logits.at[..., tokens].add(biases)


def mirostat_v2(
    logits: jax.Array, key: jax.Array, mu: jax.Array, tau: float = 5.0, eta: float = 0.1
):
    """Mirostat v2 (reference llama_sampler_init_mirostat_v2).  Returns
    (token, new_mu); mu is carried by the caller between steps."""
    probs = jax.nn.softmax(logits, axis=-1)
    surprise = -jnp.log2(probs + 1e-30)
    masked = jnp.where(surprise > mu, NEG_INF, logits)
    # guard: keep at least the argmax
    mx = jnp.max(logits, axis=-1, keepdims=True)
    masked = jnp.where(jnp.all(masked <= NEG_INF / 2, axis=-1, keepdims=True), jnp.where(logits == mx, logits, NEG_INF), masked)
    tok = jax.random.categorical(key, masked, axis=-1)
    obs = jnp.take_along_axis(surprise, tok[..., None], axis=-1)[..., 0]
    new_mu = mu - eta * (obs - tau)
    return tok, new_mu


@dataclass
class SamplerChain:
    """Ordered chain with llama.cpp-compatible defaults (common/sampling):
    penalties -> top_k -> typical -> top_p -> min_p -> xtc -> temp -> dist."""

    temp: float = 0.8
    top_k_n: int = 40
    top_p_p: float = 0.95
    min_p_p: float = 0.05
    typical_p: float = 1.0
    top_n_sigma_n: float = 0.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    repeat_penalty: float = 1.0
    freq_penalty: float = 0.0
    presence_penalty: float = 0.0
    penalty_last_n: int = 64
    seed: int = 42
    greedy: bool = False

    def apply_logits(self, logits: jax.Array, recent: jax.Array | None, key: jax.Array) -> jax.Array:
        lg = logits.astype(jnp.float32)
        if recent is not None:
            lg = penalties(lg, recent, self.repeat_penalty, self.freq_penalty, self.presence_penalty)
        if self.top_k_n > 0:
            lg = top_k(lg, self.top_k_n)
        if self.typical_p < 1.0:
            lg = typical(lg, self.typical_p)
        if self.top_p_p < 1.0:
            lg = top_p(lg, self.top_p_p)
        if self.min_p_p > 0:
            lg = min_p(lg, self.min_p_p)
        if self.top_n_sigma_n > 0:
            lg = top_n_sigma(lg, self.top_n_sigma_n)
        if self.xtc_probability > 0:
            key, sub = jax.random.split(key)
            lg = xtc(lg, self.xtc_probability, self.xtc_threshold, sub)
        lg = temperature(lg, self.temp)
        return lg

    def sample(self, logits: jax.Array, key: jax.Array, recent: jax.Array | None = None) -> jax.Array:
        if self.greedy:
            return jnp.argmax(logits, axis=-1)
        key, sub = jax.random.split(key)
        lg = self.apply_logits(logits, recent, key)
        return jax.random.categorical(sub, lg, axis=-1)
