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


def test_dry_penalizes_repeats():
    """DRY: a token that would extend a repeated sequence gets pushed
    down; unrelated tokens untouched (reference llama_sampler_init_dry)."""
    import jax.numpy as jnp
    import numpy as np

    from zllm.sampling.batched import _dry_b

    v, w = 32, 16
    lg = jnp.zeros((1, v), jnp.float32)
    # context ... 5 6 7 | 5 6 — candidate 7 extends the (5,6) match (n=2)
    recent = np.full((1, w), -1, np.int32)
    recent[0, -5:] = [5, 6, 7, 5, 6]
    out = np.asarray(_dry_b(
        lg, jnp.asarray(recent),
        jnp.asarray([1.5], jnp.float32), jnp.asarray([1.75], jnp.float32),
        jnp.asarray([2.0], jnp.float32), jnp.zeros((v,), bool),
    ))[0]
    assert out[7] < -1.0, out[7]  # mult * base^0 = 1.5
    assert out[3] == 0.0  # unrelated token untouched


def test_dry_breakers_block_matches():
    import jax.numpy as jnp
    import numpy as np

    from zllm.sampling.batched import _dry_b

    v, w = 32, 16
    lg = jnp.zeros((1, v), jnp.float32)
    recent = np.full((1, w), -1, np.int32)
    recent[0, -5:] = [5, 6, 7, 5, 6]
    br = np.zeros((v,), bool)
    br[6] = True  # 6 is a sequence breaker: the (5,6) match dies
    out = np.asarray(_dry_b(
        lg, jnp.asarray(recent),
        jnp.asarray([1.5], jnp.float32), jnp.asarray([1.75], jnp.float32),
        jnp.asarray([2.0], jnp.float32), jnp.asarray(br),
    ))[0]
    assert out[7] == 0.0, out[7]


def test_dynatemp_sharpens_confident_rows():
    """Low-entropy rows get temp below base, high-entropy rows above."""
    import jax.numpy as jnp
    import numpy as np

    from zllm.sampling.batched import _temperature_b

    lg = jnp.asarray(np.stack([
        np.array([10.0, 0, 0, 0], np.float32),   # confident
        np.array([1.0, 1.0, 1.0, 1.0], np.float32),  # uniform
    ]))
    temp = jnp.asarray([1.0, 1.0], jnp.float32)
    rng = jnp.asarray([0.5, 0.5], jnp.float32)
    expo = jnp.asarray([1.0, 1.0], jnp.float32)
    out = np.asarray(_temperature_b(lg, temp, rng, expo))
    # effective temp: confident row ~0.5 (logits doubled), uniform ~1.5
    assert out[0, 0] > 15.0, out[0]
    np.testing.assert_allclose(out[1], lg[1] / 1.5, rtol=1e-5)


def test_sample_batch_dry_end_to_end():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zllm.sampling.batched import SlotParams, sample_batch

    n, v, w = 2, 64, 16
    sp = SlotParams(n)
    sp.temp[:] = 0.0
    sp.dry_multiplier[0] = 8.0  # huge penalty on slot 0
    logits = np.zeros((n, v), np.float32)
    logits[:, 7] = 1.0  # 7 would win greedily
    recent = np.full((n, w), -1, np.int32)
    recent[:, -5:] = [5, 6, 7, 5, 6]  # 7 extends the repeat
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n)])
    toks, _, _, _ = sample_batch(
        jnp.asarray(logits), keys, jnp.asarray(recent), jnp.zeros((v,), bool),
        jnp.full((n,), 10.0, jnp.float32), *[jnp.asarray(a) for a in sp.arrays()]
    )
    toks = np.asarray(toks)
    assert toks[0] != 7  # DRY suppressed the repeat on slot 0
    assert toks[1] == 7  # slot 1 unaffected
