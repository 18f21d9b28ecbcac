"""GA evolution operators: seeded 3-generation run replayed against an
independent pure-Python oracle that follows only the documented
determinism protocol (plans/ga.py module docstring) — not the
implementation. Any drift in draw order, operator index law, tie-breaks
or caching shows up as a population mismatch."""

from __future__ import annotations

import math

import numpy as np

from predictor_spark.plans.ga import ga_search

BOUNDS = {"lag": (1, 4), "shrink": (0.0, 1.0)}


def _fitness(params: dict) -> float:
    # deterministic toy objective: optimum at shrink=0.3, lag=1
    return (params["shrink"] - 0.3) ** 2 + 0.1 * params["lag"]


def _oracle_replay(seed: int, pop_size: int, n_gens: int,
                   cxpb: float, mutpb: float, indpb: float):
    """Pure-Python replay of the spec: one rng, draw order = init ->
    (select, crossover, mutate) per generation. Returns per-generation
    (population, fitnesses, best)."""
    rng = np.random.default_rng(seed)
    keys = sorted(BOUNDS)  # ['lag', 'shrink']

    def new_gene(k):
        lo, hi = BOUNDS[k]
        if isinstance(lo, int) and isinstance(hi, int):
            return int(rng.integers(lo, hi + 1))
        return float(rng.uniform(lo, hi))

    pop = [[new_gene(k) for k in keys] for _ in range(pop_size)]
    fits = [None] * pop_size
    cache = {}
    best_f, best_p = math.inf, {}
    gens = []
    for gen in range(n_gens):
        for i in range(pop_size):
            if fits[i] is None:
                key = tuple(pop[i])
                if key not in cache:
                    cache[key] = _fitness(dict(zip(keys, pop[i])))
                fits[i] = cache[key]
        for i in range(pop_size):
            if fits[i] < best_f:
                best_f, best_p = fits[i], dict(zip(keys, pop[i]))
        gens.append(([list(i) for i in pop], list(fits), best_f, dict(best_p)))
        if gen == n_gens - 1:
            break
        # tournament-3, ties to earliest drawn
        newpop = []
        for _ in range(pop_size):
            asp = rng.integers(0, pop_size, size=3)
            b = asp[0]
            for a in asp[1:]:
                if fits[a] < fits[b]:
                    b = a
            newpop.append(list(pop[b]))
        pop = newpop
        fits = [cache[tuple(ind)] for ind in pop]
        # crossover pairs, DEAP index law
        for i in range(1, pop_size, 2):
            if rng.random() < cxpb:
                size = len(keys)
                a = int(rng.integers(1, size + 1))
                b2 = int(rng.integers(1, size))
                if b2 >= a:
                    b2 += 1
                else:
                    a, b2 = b2, a
                pop[i - 1][a:b2], pop[i][a:b2] = pop[i][a:b2], pop[i - 1][a:b2]
                fits[i - 1] = fits[i] = None
        # mutation
        for i in range(pop_size):
            if rng.random() < mutpb:
                for gi, k in enumerate(keys):
                    if rng.random() < indpb:
                        lo, hi = BOUNDS[k]
                        if isinstance(lo, int) and isinstance(hi, int):
                            pop[i][gi] = int(rng.integers(lo, hi + 1))
                        else:
                            sig = 0.1 * (hi - lo)
                            pop[i][gi] = float(min(hi, max(lo, pop[i][gi] + rng.normal(0.0, sig))))
                fits[i] = None
    return gens


def test_ga_matches_pure_python_oracle():
    pop_size, n_gens = 8, 3
    res = ga_search(BOUNDS, _fitness, pop_size=pop_size, n_generations=n_gens,
                    cxpb=0.5, mutpb=0.4, indpb=0.5, seed=42, max_parallel=2)
    want = _oracle_replay(42, pop_size, n_gens, cxpb=0.5, mutpb=0.4, indpb=0.5)
    assert len(res.history) == n_gens
    keys = sorted(BOUNDS)
    for got, (wpop, wfits, wbest_f, wbest_p) in zip(res.history, want):
        assert got["population"] == [dict(zip(keys, ind)) for ind in wpop]
        assert got["fitnesses"] == wfits
        assert got["best_fitness"] == wbest_f
        assert got["best_params"] == wbest_p
    # GA must actually improve over the initial generation
    assert res.history[-1]["best_fitness"] <= res.history[0]["best_fitness"]
    assert res.best_fitness == want[-1][2]


def test_ga_crash_isolation_and_patience(tmp_path):
    calls = []

    def boom(params):
        calls.append(params)
        raise RuntimeError("candidate crashed")

    res = ga_search(BOUNDS, boom, pop_size=4, n_generations=4, seed=1,
                    patience=2, checkpoint_path=str(tmp_path / "ck.json"))
    # every candidate crashed -> inf fitness, patience stops the loop early
    assert math.isinf(res.best_fitness)
    assert len(res.history) <= 3
    assert (tmp_path / "ck.json").exists()


def test_ga_checkpoint_resume_bit_identical(tmp_path):
    """2 generations + resume-to-5 must equal an uninterrupted 5-gen run
    (population, fitnesses, champion — the full history), and a rerun of
    a finished search must return its champion without re-evaluating."""
    ck = str(tmp_path / "resume.json")
    straight = ga_search(BOUNDS, _fitness, pop_size=6, n_generations=5,
                         seed=7, checkpoint_path=str(tmp_path / "straight.json"))
    ga_search(BOUNDS, _fitness, pop_size=6, n_generations=2, seed=7,
              checkpoint_path=ck)
    resumed = ga_search(BOUNDS, _fitness, pop_size=6, n_generations=5,
                        seed=7, checkpoint_path=ck)
    assert len(resumed.history) == len(straight.history) == 5
    for a, b in zip(straight.history, resumed.history):
        assert a["population"] == b["population"]
        assert a["fitnesses"] == b["fitnesses"]
        assert a["best_fitness"] == b["best_fitness"]
    assert resumed.best_params == straight.best_params
    calls = []

    def counting(params):
        calls.append(params)
        return _fitness(params)

    done = ga_search(BOUNDS, counting, pop_size=6, n_generations=5,
                     seed=7, checkpoint_path=ck)
    assert calls == []                        # finished search: no re-evals
    assert done.best_params == straight.best_params
    assert done.best_fitness == straight.best_fitness


def test_ga_checkpoint_ignored_on_mismatch(tmp_path):
    """A checkpoint from different bounds/seed must not be resumed."""
    ck = str(tmp_path / "ck.json")
    ga_search(BOUNDS, _fitness, pop_size=4, n_generations=2, seed=3,
              checkpoint_path=ck)
    other = ga_search(BOUNDS, _fitness, pop_size=4, n_generations=2, seed=4,
                      checkpoint_path=ck)
    fresh = ga_search(BOUNDS, _fitness, pop_size=4, n_generations=2, seed=4)
    assert other.best_params == fresh.best_params
    assert other.best_fitness == fresh.best_fitness
