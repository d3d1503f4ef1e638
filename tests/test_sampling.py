"""Sampler distribution assertions (pattern: reference
tests/test-sampling.cpp — known logits in, expected candidate set /
probabilities out)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zllm.sampling import samplers as S


def probs_of(logits):
    return np.asarray(jax.nn.softmax(jnp.asarray(logits, jnp.float32)))


def kept(logits):
    return set(np.flatnonzero(np.asarray(logits) > S.NEG_INF / 2).tolist())


def test_top_k():
    lg = jnp.asarray([0.1, 1.0, 0.5, -2.0, 3.0])
    assert kept(S.top_k(lg, 2)) == {1, 4}
    assert kept(S.top_k(lg, 0)) == {0, 1, 2, 3, 4}


def test_top_p():
    lg = jnp.log(jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05]))
    assert kept(S.top_p(lg, 0.79)) == {0, 1}
    assert kept(S.top_p(lg, 0.81)) == {0, 1, 2}
    assert kept(S.top_p(lg, 1.0)) == {0, 1, 2, 3, 4}


def test_min_p():
    lg = jnp.log(jnp.asarray([0.6, 0.2, 0.1, 0.05, 0.05]))
    # threshold 0.2: keep p >= 0.2*0.6 = 0.12
    assert kept(S.min_p(lg, 0.2)) == {0, 1}
    assert kept(S.min_p(lg, 0.0)) == {0, 1, 2, 3, 4}


def test_temperature_greedy():
    lg = jnp.asarray([0.0, 2.0, 1.0])
    assert kept(S.temperature(lg, 0.0)) == {1}
    np.testing.assert_allclose(np.asarray(S.temperature(lg, 2.0)), [0, 1.0, 0.5])


def test_top_n_sigma():
    lg = jnp.asarray([10.0, 9.9, 5.0, 0.0])
    out = S.top_n_sigma(lg, 1.0)
    assert 0 in kept(out) and 1 in kept(out) and 3 not in kept(out)


def test_penalties():
    lg = jnp.asarray([1.0, 2.0, -1.0, 0.5])
    recent = jnp.asarray([1, 1, 2, -1, -1], jnp.int32)
    out = np.asarray(S.penalties(lg, recent, repeat_penalty=2.0, freq_penalty=0.1, presence_penalty=0.2))
    assert out[0] == 1.0 and out[3] == 0.5  # untouched
    assert out[1] == pytest.approx(2.0 / 2.0 - 2 * 0.1 - 0.2)
    assert out[2] == pytest.approx(-1.0 * 2.0 - 1 * 0.1 - 0.2)


def test_typical_keeps_probable():
    lg = jnp.log(jnp.asarray([0.97, 0.01, 0.01, 0.01]))
    out = S.typical(lg, 0.5)
    assert 0 in kept(out)


def test_chain_statistics():
    """Sampling from a known distribution approximates it."""
    rng = jax.random.PRNGKey(0)
    p = np.array([0.5, 0.3, 0.15, 0.05], np.float32)
    lg = jnp.log(jnp.asarray(p))
    chain = S.SamplerChain(temp=1.0, top_k_n=0, top_p_p=1.0, min_p_p=0.0)
    keys = jax.random.split(rng, 2000)
    toks = jax.vmap(lambda k: chain.sample(lg, k))(keys)
    counts = np.bincount(np.asarray(toks), minlength=4) / 2000
    np.testing.assert_allclose(counts, p, atol=0.05)


def test_mirostat_v2_adapts():
    rng = jax.random.PRNGKey(1)
    lg = jnp.log(jnp.asarray([0.4, 0.3, 0.2, 0.1]))
    mu = jnp.asarray(8.0)
    for i in range(10):
        rng, k = jax.random.split(rng)
        tok, mu = S.mirostat_v2(lg, k, mu, tau=2.0, eta=0.5)
    assert 0 <= int(tok) < 4
    assert np.isfinite(float(mu))


def test_greedy_chain():
    lg = jnp.asarray([0.1, 5.0, 2.0])
    chain = S.SamplerChain(greedy=True)
    assert int(chain.sample(lg, jax.random.PRNGKey(0))) == 1
