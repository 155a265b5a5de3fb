"""HMM tests: Viterbi against hand-computed + brute-force references,
forward-backward against exhaustive path enumeration, Baum-Welch monotone
likelihood ascent, serialization round-trip, Spark/local parity."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml.hmm import (
    HmmModel,
    _forward_backward,
    hmm_baum_welch,
    hmm_generate,
    hmm_viterbi,
    viterbi_path,
)

# the classic "Healthy/Fever" fixture: states (H=0, F=1),
# observations (normal=0, cold=1, dizzy=2)
FIXTURE = HmmModel(
    pi=np.array([0.6, 0.4]),
    a=np.array([[0.7, 0.3], [0.4, 0.6]]),
    b=np.array([[0.5, 0.4, 0.1], [0.1, 0.3, 0.6]]),
)


def brute_force_best_path(obs, m: HmmModel):
    best, best_p = None, -1.0
    for path in itertools.product(range(m.n_states), repeat=len(obs)):
        p = m.pi[path[0]] * m.b[path[0], obs[0]]
        for t in range(1, len(obs)):
            p *= m.a[path[t - 1], path[t]] * m.b[path[t], obs[t]]
        if p > best_p:
            best, best_p = path, p
    return list(best)


def brute_force_gamma(obs, m: HmmModel):
    """P(s_t = i | obs) by enumerating every path."""
    T = len(obs)
    joint = np.zeros((T, m.n_states))
    total = 0.0
    for path in itertools.product(range(m.n_states), repeat=T):
        p = m.pi[path[0]] * m.b[path[0], obs[0]]
        for t in range(1, T):
            p *= m.a[path[t - 1], path[t]] * m.b[path[t], obs[t]]
        total += p
        for t in range(T):
            joint[t, path[t]] += p
    return joint / total, total


class TestViterbiLocal:
    def test_hand_computed_fixture(self):
        # known answer for [normal, cold, dizzy]: H H F
        assert list(viterbi_path(np.array([0, 1, 2]), FIXTURE)) == [0, 0, 1]

    def test_matches_brute_force(self):
        rng = np.random.RandomState(3)
        for _ in range(5):
            m = HmmModel(
                pi=_rand_dist(rng, 2)[0],
                a=_rand_dist(rng, 2, 2),
                b=_rand_dist(rng, 2, 3),
            )
            obs = rng.randint(0, 3, size=6)
            got = list(viterbi_path(obs, m))
            want = brute_force_best_path(obs, m)
            assert got == want

    def test_single_observation(self):
        assert list(viterbi_path(np.array([2]), FIXTURE)) == [1]


class TestForwardBackward:
    def test_gamma_matches_enumeration(self):
        rng = np.random.RandomState(5)
        m = HmmModel(
            pi=_rand_dist(rng, 2)[0],
            a=_rand_dist(rng, 2, 2),
            b=_rand_dist(rng, 2, 3),
        )
        obs = np.array([0, 2, 1, 1, 0])
        gamma, xi, ll = _forward_backward(obs, m)
        want_gamma, want_total = brute_force_gamma(obs, m)
        np.testing.assert_allclose(gamma, want_gamma, rtol=1e-10)
        assert ll == pytest.approx(np.log(want_total), rel=1e-10)
        # xi consistency: sum_j xi[t,i,j] == gamma[t,i] for t < T-1
        np.testing.assert_allclose(xi.sum(axis=2), gamma[:-1], rtol=1e-10)

    def test_long_sequence_no_underflow(self):
        obs = np.array([0, 1, 2] * 400)
        gamma, _, ll = _forward_backward(obs, FIXTURE)
        assert np.isfinite(ll) and np.isfinite(gamma).all()


class TestSparkHmm:
    def test_viterbi_spark_matches_local(self, spark):
        rows = []
        rng = np.random.RandomState(11)
        seqs = {}
        for sid in range(6):
            obs = hmm_generate(FIXTURE, steps=20, seed=sid)
            seqs[sid] = obs
            rows += [(sid, t, o) for t, o in enumerate(obs)]
        sdf = spark.createDataFrame(rows, "seq_id int, t int, obs int")
        out = hmm_viterbi(sdf, ["seq_id"], "t", "obs", FIXTURE)
        got = {
            (r["seq_id"], r["t"]): r["state"] for r in out.collect()
        }
        for sid, obs in seqs.items():
            want = list(viterbi_path(np.array(obs), FIXTURE))
            assert [got[(sid, t)] for t in range(len(obs))] == want

    def test_baum_welch_monotone_loglik(self, spark):
        rows = []
        for sid in range(8):
            obs = hmm_generate(FIXTURE, steps=30, seed=100 + sid)
            rows += [(sid, t, o) for t, o in enumerate(obs)]
        sdf = spark.createDataFrame(rows, "seq_id int, t int, obs int")
        model, hist = hmm_baum_welch(
            sdf, ["seq_id"], "t", "obs", n_states=2, n_obs=3, iterations=6
        )
        assert len(hist) >= 2
        # EM guarantees monotone non-decreasing likelihood
        for prev, nxt in zip(hist, hist[1:]):
            assert nxt >= prev - 1e-9
        # model stays a proper distribution
        np.testing.assert_allclose(model.a.sum(axis=1), 1.0, rtol=1e-9)
        np.testing.assert_allclose(model.b.sum(axis=1), 1.0, rtol=1e-9)
        assert model.pi.sum() == pytest.approx(1.0, rel=1e-9)

    def test_uniform_transitions_decode_is_per_symbol_argmax(self, spark):
        """The property the ml_hmm_decode oracle relies on."""
        m = HmmModel(
            pi=np.array([0.5, 0.5]),
            a=np.array([[0.5, 0.5], [0.5, 0.5]]),
            b=np.array([[0.35, 0.05, 0.05, 0.15, 0.40], [0.10, 0.15, 0.45, 0.20, 0.10]]),
        )
        obs = np.array([0, 1, 2, 3, 4, 0, 4, 2])
        want = [int(np.argmax(m.b[:, o])) for o in obs]
        assert list(viterbi_path(obs, m)) == want


class TestSerialization:
    def test_round_trip(self, tmp_path):
        p = str(tmp_path / "hmm.json")
        FIXTURE.save(p)
        loaded = HmmModel.load(p)
        np.testing.assert_array_equal(loaded.a, FIXTURE.a)
        np.testing.assert_array_equal(loaded.b, FIXTURE.b)
        np.testing.assert_array_equal(loaded.pi, FIXTURE.pi)

    def test_generate_deterministic(self):
        assert hmm_generate(FIXTURE, 10, seed=1) == hmm_generate(FIXTURE, 10, seed=1)
        assert hmm_generate(FIXTURE, 10, seed=1) != hmm_generate(FIXTURE, 10, seed=2)


def _rand_dist(rng, *shape):
    m = rng.uniform(0.05, 1.0, size=shape if len(shape) > 1 else (1, shape[0]))
    return m / m.sum(axis=-1, keepdims=True)


class TestBatchViterbi:
    def test_batch_equals_per_sequence(self):
        import numpy as np

        from tuktu_spark.ml.hmm import HmmModel, viterbi_path, viterbi_paths_batch

        rng = np.random.RandomState(11)
        model = HmmModel(
            pi=np.array([0.6, 0.4]),
            a=np.array([[0.7, 0.3], [0.2, 0.8]]),
            b=np.array([[0.5, 0.4, 0.1], [0.1, 0.3, 0.6]]),
        )
        seqs = [rng.randint(0, 3, rng.randint(1, 40)).tolist() for _ in range(100)]
        seqs += [[0], [2, 2, 2], []]
        batch = viterbi_paths_batch(seqs, model)
        for s, got in zip(seqs, batch):
            if not s:
                assert got == []
                continue
            exact = viterbi_path(np.asarray(s, dtype="int64"), model).tolist()
            assert got == exact
