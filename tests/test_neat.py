"""NEAT search: seeded multi-generation run replayed against an
independent pure-Python oracle that follows only the documented
determinism protocol (plans/neat.py module docstring) — not the
implementation. Any drift in draw order, speciation placement,
offspring allocation, crossover inheritance or mutation order shows up
as a population mismatch. Plus behavioral checks: structural diversity
actually emerges, bounds hold, crashes isolate, patience stops early."""

from __future__ import annotations

import math

import numpy as np

from predictor_spark.plans.neat import neat_search

BOUNDS = {"alpha": (0.0, 1.0), "beta": (-1.0, 1.0), "lag": (1, 4)}


def _fitness(params: dict) -> float:
    # deterministic toy objective; absent genes fall back to defaults.
    # optimum: alpha=0.4, beta present near 0.2, lag=1
    a = params.get("alpha", 0.9)
    b = params.get("beta", -0.8)
    lag = params.get("lag", 3)
    return (a - 0.4) ** 2 + 0.5 * (b - 0.2) ** 2 + 0.05 * lag


def _is_int(lo, hi):
    return isinstance(lo, int) and isinstance(hi, int)


def _oracle_replay(seed, pop_size, n_gens, *, threshold=2.0, add_prob=0.3,
                   remove_prob=0.1, mutpb=0.3, min_params=1,
                   survival_rate=0.5, interspecies_rate=0.05, elitism=1):
    """Pure-Python replay of the spec in plans/neat.py's docstring.
    Genomes are dicts innovation -> (param, value); innovations are 1..k
    over sorted(BOUNDS); initial params = first 2 sorted."""
    rng = np.random.default_rng(seed)
    all_params = sorted(BOUNDS)
    innov = {p: i + 1 for i, p in enumerate(all_params)}
    init_list = all_params[:2]

    def draw(p):
        lo, hi = BOUNDS[p]
        return float(rng.integers(lo, hi + 1)) if _is_int(lo, hi) \
            else float(rng.uniform(lo, hi))

    def to_params(genes):
        out = {}
        for name, val in genes.values():
            lo, hi = BOUNDS[name]
            out[name] = int(round(val)) if _is_int(lo, hi) else float(val)
        return out

    def dist(g1, g2):
        k1, k2 = set(g1), set(g2)
        m = k1 & k2
        dj = len(k1 ^ k2)
        n = max(len(k1), len(k2), 1)
        if m:
            w = sum(abs(g1[i][1] - g2[i][1])
                    / ((BOUNDS[g1[i][0]][1] - BOUNDS[g1[i][0]][0]) or 1.0)
                    for i in m) / len(m)
        else:
            w = 0.0
        return 1.0 * dj / n + 0.4 * w

    # population: list of [genes_dict, fitness]
    pop = [[{innov[p]: (p, draw(p)) for p in init_list}, None]
           for _ in range(pop_size)]
    species = []  # dicts: id, rep (genes), members (indices into pop list)
    cache = {}
    best_f, best_p = math.inf, {}
    gens = []
    for gen in range(n_gens):
        for ind in pop:
            if ind[1] is None:
                key = tuple(sorted(to_params(ind[0]).items()))
                if key not in cache:
                    cache[key] = _fitness(to_params(ind[0]))
                ind[1] = cache[key]
        for ind in pop:
            if ind[1] < best_f:
                best_f, best_p = ind[1], to_params(ind[0])
        # speciate
        for sp in species:
            sp["members"] = []
        for ind in pop:
            for sp in species:
                if dist(ind[0], sp["rep"]) < threshold:
                    sp["members"].append(ind)
                    break
            else:
                species.append({"id": max((s["id"] for s in species),
                                          default=0) + 1,
                                "rep": dict(ind[0]), "members": [ind]})
        species = [s for s in species if s["members"]]
        for sp in species:
            sp["rep"] = dict(sp["members"][int(rng.integers(0, len(sp["members"])))][0])
        gens.append({
            "population": [to_params(ind[0]) for ind in pop],
            "fitnesses": [ind[1] for ind in pop],
            "best_fitness": best_f,
            "best_params": dict(best_p),
            "n_species": len(species),
            "mean_complexity": float(np.mean([len(ind[0]) for ind in pop])),
        })
        if gen == n_gens - 1:
            break
        # reproduction
        adj = [max(sum(ind[1] / len(sp["members"]) for ind in sp["members"]
                       if math.isfinite(ind[1])), 1e-10) for sp in species]
        inv = [1.0 / a for a in adj]
        tot = max(sum(inv), 1e-10)
        newpop = []
        for sp, sp_inv in zip(species, inv):
            members = sorted(sp["members"], key=lambda ind: ind[1])
            for elite in members[:elitism]:
                newpop.append([dict(elite[0]), elite[1]])
            n_off = max(0, int(round(pop_size * sp_inv / tot)) - elitism)
            pool = members[:max(1, int(len(members) * survival_rate))]
            for _ in range(n_off):
                if len(pool) < 2 or rng.random() < 0.25:
                    child = dict(pool[int(rng.integers(0, len(pool)))][0])
                else:
                    if rng.random() < interspecies_rate and len(species) > 1:
                        others = [s for s in species if s["id"] != sp["id"]]
                        osp = others[int(rng.integers(0, len(others)))]
                        p2 = osp["members"][int(rng.integers(0, len(osp["members"])))]
                    else:
                        p2 = pool[int(rng.integers(0, len(pool)))]
                    p1 = pool[int(rng.integers(0, len(pool)))]
                    if p2[1] < p1[1]:
                        p1, p2 = p2, p1
                    child = {}
                    for i in sorted(set(p1[0]) & set(p2[0])):
                        child[i] = (p1[0] if int(rng.integers(0, 2)) == 0
                                    else p2[0])[i]
                    for i in set(p1[0]) - set(p2[0]):
                        child[i] = p1[0][i]
                # add
                if rng.random() < add_prob:
                    absent = [p for p in all_params
                              if p not in {nm for nm, _ in child.values()}]
                    if absent:
                        p = absent[int(rng.integers(0, len(absent)))]
                        child[innov[p]] = (p, draw(p))
                # remove
                if rng.random() < remove_prob and len(child) > min_params:
                    ks = sorted(child)
                    del child[ks[int(rng.integers(0, len(ks)))]]
                # values
                for i in sorted(child):
                    if rng.random() < mutpb:
                        name, val = child[i]
                        lo, hi = BOUNDS[name]
                        if _is_int(lo, hi):
                            child[i] = (name, float(rng.integers(lo, hi + 1)))
                        else:
                            nv = min(float(hi), max(float(lo),
                                     val + rng.normal(0.0, 0.1 * (hi - lo))))
                            child[i] = (name, float(nv))
                newpop.append([child, None])
        while len(newpop) < pop_size:
            newpop.append([{innov[p]: (p, draw(p)) for p in init_list}, None])
        pop = newpop[:pop_size]
    return gens


def test_neat_matches_pure_python_oracle():
    kw = dict(threshold=2.0, add_prob=0.3, remove_prob=0.1, mutpb=0.3,
              min_params=1, survival_rate=0.5, interspecies_rate=0.05,
              elitism=1)
    res = neat_search(BOUNDS, _fitness, pop_size=10, n_generations=6,
                      seed=11, max_parallel=4, **kw)
    oracle = _oracle_replay(11, 10, 6, **kw)
    assert len(res.history) == len(oracle) == 6
    for got, exp in zip(res.history, oracle):
        assert got["population"] == exp["population"]
        assert got["fitnesses"] == exp["fitnesses"]
        assert got["best_fitness"] == exp["best_fitness"]
        assert got["best_params"] == exp["best_params"]
        assert got["n_species"] == exp["n_species"]
        assert got["mean_complexity"] == exp["mean_complexity"]
    assert res.best_fitness == oracle[-1]["best_fitness"]


def test_neat_structural_diversity_and_bounds():
    # threshold sized to the genome: a 2- vs 3-gene structural difference
    # is c1*1/3 ~ 0.33, so 0.3 splits structures into distinct species
    res = neat_search(BOUNDS, _fitness, pop_size=12, n_generations=8,
                      seed=3, threshold=0.3, add_prob=0.4, remove_prob=0.15,
                      mutpb=0.3, interspecies_rate=0.05, max_parallel=4)
    structures = {frozenset(p) for h in res.history for p in h["population"]}
    assert len(structures) >= 2          # structural mutation really fires
    assert any(h["n_species"] >= 2 for h in res.history)
    for h in res.history:
        for p in h["population"]:
            for k, v in p.items():
                lo, hi = BOUNDS[k]
                assert lo <= v <= hi
    # champion trajectory is monotone non-increasing and beats init-only
    traj = [h["best_fitness"] for h in res.history]
    assert all(b <= a for a, b in zip(traj, traj[1:]))
    # the full-genome optimum region is reachable only by adding 'lag'
    # (absent genes default to lag=3 at +0.10 fitness); with add_prob=0.4
    # over 8 generations the champion should have discovered it
    assert "lag" in res.best_params and res.best_params["lag"] == 1


def test_neat_crash_isolation_and_patience(tmp_path):
    calls = {"n": 0}

    def bomb(params: dict) -> float:
        calls["n"] += 1
        if params.get("lag", 1) >= 3:      # absent gene -> safe default
            raise RuntimeError("candidate crash")
        return _fitness(params)

    ck = tmp_path / "neat_ck.json"
    res = neat_search(BOUNDS, bomb, pop_size=8, n_generations=10,
                      seed=5, patience=2, max_parallel=4,
                      checkpoint_path=str(ck))
    assert math.isfinite(res.best_fitness)
    assert any(not math.isfinite(f) for h in res.history
               for f in h["fitnesses"])        # crashes became inf, not raises
    assert len(res.history) < 10               # patience stopped early
    assert ck.exists()
