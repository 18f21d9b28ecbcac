"""Forward passes of the deep-model cores emitted as layered SQL scalar
expressions over the 8 values of a trailing window — the machinery behind
the *_forward_pass companion queries (VERDICT r2 next-1e): Spark evaluates
the layers as chained withColumns (pure JVM whole-stage codegen, no
Python) and the DuckDB oracle nests the IDENTICAL strings as subqueries,
so the hard gate value-verifies the architecture math even though the
training loops themselves are not SQL-replayable.

Only the computation that reaches the last-position head is emitted: the
attention query is taken at the final timestep, so earlier positions
contribute keys/values only — this trims the transformer tree by ~8x.
"""

from __future__ import annotations

import numpy as np

Layers = "list[dict[str, str]]"


def _lit(x) -> str:
    return repr(float(x))


def _dot(terms: list[tuple[str, float]], bias: float | None = None) -> str:
    s = " + ".join(f"{c} * {_lit(w)}" for c, w in terms)
    if bias is not None and bias != 0.0:
        s = f"{s} + {_lit(bias)}"
    return s


def layers_to_oracle(layers, final_select: str, window: int = 8) -> str:
    """Wrap expression layers into a DuckDB query over per-user trailing
    windows of the events table (complete windows only)."""
    nested = f"""(
        SELECT event_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS w,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events
    )"""
    nested = f"(SELECT * FROM {nested} WHERE rn >= {window}) base"
    for idx, layer in enumerate(layers):
        cols = ", ".join(f"{e} AS {c}" for c, e in layer.items())
        nested = f"(SELECT *, {cols} FROM {nested}) l{idx}"
    return f"SELECT {final_select} FROM {nested}"


def apply_layers(df, layers):
    """Apply expression layers to a DataFrame as chained JVM projections.

    Each layer carries a throwaway nondeterministic column (rand) as a
    CollapseProject BARRIER: without it Catalyst inlines every layer into
    one projection, duplicating shared subtrees exponentially (h0_j is
    referenced by all 8 residual columns, each of which every z1_j
    references, ...) and the resulting ~50k-node tree overflows
    whole-stage codegen into interpreted evaluation — measured 2.6x
    slower end-to-end at sf0.1. With the barrier every layer stays its
    own projection stage inside one WholeStageCodegen, each column
    computed once."""
    from pyspark.sql import functions as F

    for i, layer in enumerate(layers):
        cols = {c: F.expr(e) for c, e in layer.items()}
        cols[f"__barrier{i}"] = F.rand(0)
        df = df.withColumns(cols)
    return df.drop(*[f"__barrier{i}" for i in range(len(layers))])


# --------------------------------------------------------------------------
# transformer encoder (models/transformer.py forward, last-position head)
# --------------------------------------------------------------------------

def transformer_forward_layers(raw: list[str], p: dict) -> list[dict[str, str]]:
    from predictor_spark.models.layers import positional_encoding

    D = len(raw)
    dm, H = int(p["__meta"][1]), int(p["__meta"][2])
    dff = int(p["__meta"][3])
    dk = dm // H
    pe = positional_encoding(D, dm)
    Ls: list[dict[str, str]] = []
    Ls.append({f"x{t}": f"({raw[t]}) / 100.0" for t in range(D)})
    # embed (We (1,dm), be, + PE literal)
    Ls.append({f"e_{t}_{d}":
               f"x{t} * {_lit(p['We'][0, d])} + {_lit(p['be'][d] + pe[t, d])}"
               for t in range(D) for d in range(dm)})
    # keys/values for all positions, query at the last position only
    kv = {}
    for h in range(H):
        for j in range(dk):
            kv[f"q{h}_{j}"] = _dot([(f"e_{D-1}_{d}", p[f"Wq{h}"][d, j])
                                    for d in range(dm)])
            for t in range(D):
                kv[f"k{h}_{t}_{j}"] = _dot([(f"e_{t}_{d}", p[f"Wk{h}"][d, j])
                                            for d in range(dm)])
                kv[f"v{h}_{t}_{j}"] = _dot([(f"e_{t}_{d}", p[f"Wv{h}"][d, j])
                                            for d in range(dm)])
    Ls.append(kv)
    scale = 1.0 / np.sqrt(dk)
    Ls.append({f"s{h}_{u}":
               "(" + " + ".join(f"q{h}_{j} * k{h}_{u}_{j}" for j in range(dk))
               + f") * {_lit(scale)}"
               for h in range(H) for u in range(D)})
    # stable softmax, matching layers.softmax
    Ls.append({f"m{h}": "greatest(" + ", ".join(f"s{h}_{u}" for u in range(D)) + ")"
               for h in range(H)})
    Ls.append({f"ex{h}_{u}": f"exp(s{h}_{u} - m{h})"
               for h in range(H) for u in range(D)})
    Ls.append({f"den{h}": " + ".join(f"ex{h}_{u}" for u in range(D))
               for h in range(H)})
    Ls.append({f"o{h}_{j}":
               " + ".join(f"(ex{h}_{u} / den{h}) * v{h}_{u}_{j}" for u in range(D))
               for h in range(H) for j in range(dk)})
    # concat heads -> Wo projection + residual with e_{D-1}
    Ls.append({f"r_{d}":
               f"e_{D-1}_{d} + " + "(" + _dot(
                   [(f"o{h}_{j}", p["Wo"][h * dk + j, d])
                    for h in range(H) for j in range(dk)], p["bo"][d]) + ")"
               for d in range(dm)})
    Ls += _ln_layers("ln1", [f"r_{d}" for d in range(dm)], p["g1"], p["bn1"])
    Ls.append({f"z1_{j}": _dot([(f"ln1_{d}", p["W1"][d, j]) for d in range(dm)],
                               p["b1"][j])
               for j in range(dff)})
    Ls.append({f"a1_{j}": f"greatest(z1_{j}, 0.0)" for j in range(dff)})
    Ls.append({f"r2_{d}": f"ln1_{d} + ("
               + _dot([(f"a1_{j}", p["W2"][j, d]) for j in range(dff)], p["b2"][d])
               + ")"
               for d in range(dm)})
    Ls += _ln_layers("ln2", [f"r2_{d}" for d in range(dm)], p["g2"], p["bn2"])
    Ls.append({"y": _dot([(f"ln2_{d}", p["Wh1"][d]) for d in range(dm)],
                         float(p["ch1"]))})
    return Ls


def _ln_layers(name: str, cols: list[str], g: np.ndarray, b: np.ndarray):
    """Layer normalization over the listed columns (models/layers.py
    layernorm: mean/biased var over the feature axis, eps 1e-5)."""
    n = len(cols)
    mean = "(" + " + ".join(cols) + f") / {_lit(n)}"
    out = [{f"{name}_mu": mean}]
    var = "(" + " + ".join(f"({c} - {name}_mu) * ({c} - {name}_mu)" for c in cols) \
        + f") / {_lit(n)}"
    out.append({f"{name}_var": var})
    out.append({f"{name}_{d}":
                f"{_lit(g[d])} * ({cols[d]} - {name}_mu) / sqrt({name}_var + 1e-05)"
                + (f" + {_lit(b[d])}" if b[d] != 0.0 else "")
                for d in range(n)})
    return out


# --------------------------------------------------------------------------
# TFT-lite (models/tft.py forward, last-position head)
# --------------------------------------------------------------------------

def _grn_layers(name: str, prefix: str, cols: list[str], p: dict):
    """GRN(x) = LN(x + sigmoid(Wg h2 + bg) * (Wv h2 + bv)),
    h2 = Wb elu(Wa x + ba) + bb — models/tft.py _grn_forward."""
    dm = len(cols)
    out = []
    out.append({f"{name}_z1_{d}": _dot([(cols[i], p[f"{prefix}Wa"][i, d])
                                        for i in range(dm)], p[f"{prefix}ba"][d])
                for d in range(dm)})
    out.append({f"{name}_a1_{d}":
                f"CASE WHEN {name}_z1_{d} > 0.0 THEN {name}_z1_{d} "
                f"ELSE exp({name}_z1_{d}) - 1.0 END"
                for d in range(dm)})
    out.append({f"{name}_h2_{d}": _dot([(f"{name}_a1_{i}", p[f"{prefix}Wb"][i, d])
                                        for i in range(dm)], p[f"{prefix}bb"][d])
                for d in range(dm)})
    out.append({f"{name}_r_{d}":
                f"{cols[d]} + ("
                + _dot([(f"{name}_h2_{i}", p[f"{prefix}Wv"][i, d])
                        for i in range(dm)], p[f"{prefix}bv"][d])
                + ") * (1.0 / (1.0 + exp(-("
                + _dot([(f"{name}_h2_{i}", p[f"{prefix}Wg"][i, d])
                        for i in range(dm)], p[f"{prefix}bg"][d])
                + "))))"
                for d in range(dm)})
    out += _ln_layers(name, [f"{name}_r_{d}" for d in range(dm)],
                      p[f"{prefix}gm"], p[f"{prefix}bt"])
    return out


def tft_forward_layers(raw: list[str], p: dict) -> list[dict[str, str]]:
    D = len(raw)
    dm, taps = int(p["__meta"][1]), int(p["__meta"][2])
    Ls: list[dict[str, str]] = []
    Ls.append({f"x{t}": f"({raw[t]}) / 100.0" for t in range(D)})
    Ls.append({f"e_{t}_{d}": f"x{t} * {_lit(p['We'][0, d])}"
               + (f" + {_lit(p['be'][d])}" if p["be"][d] != 0.0 else "")
               for t in range(D) for d in range(dm)})
    for t in range(D):
        Ls += _grn_layers(f"g1t{t}", "g1_", [f"e_{t}_{d}" for d in range(dm)], p)
    # causal conv (zero-padded history) + elu
    conv = {}
    for t in range(D):
        for d in range(dm):
            terms = []
            for k in range(taps):
                if t - k >= 0:
                    terms += [(f"g1t{t-k}_{i}", p[f"Wc{k}"][i, d])
                              for i in range(dm)]
            conv[f"zc_{t}_{d}"] = _dot(terms, p["bc"][d])
    Ls.append(conv)
    Ls.append({f"c_{t}_{d}":
               f"CASE WHEN zc_{t}_{d} > 0.0 THEN zc_{t}_{d} "
               f"ELSE exp(zc_{t}_{d}) - 1.0 END"
               for t in range(D) for d in range(dm)})
    for t in range(D):
        Ls += _grn_layers(f"g2t{t}", "g2_", [f"c_{t}_{d}" for d in range(dm)], p)
    # single-head attention, query at the last position
    kv = {f"q_{j}": _dot([(f"g2t{D-1}_{d}", p["Wq"][d, j]) for d in range(dm)])
          for j in range(dm)}
    for t in range(D):
        for j in range(dm):
            kv[f"k_{t}_{j}"] = _dot([(f"g2t{t}_{d}", p["Wk"][d, j])
                                     for d in range(dm)])
            kv[f"v_{t}_{j}"] = _dot([(f"g2t{t}_{d}", p["Wv_a"][d, j])
                                     for d in range(dm)])
    Ls.append(kv)
    scale = 1.0 / np.sqrt(dm)
    Ls.append({f"s_{u}": "(" + " + ".join(f"q_{j} * k_{u}_{j}" for j in range(dm))
               + f") * {_lit(scale)}" for u in range(D)})
    Ls.append({"sm": "greatest(" + ", ".join(f"s_{u}" for u in range(D)) + ")"})
    Ls.append({f"exs_{u}": f"exp(s_{u} - sm)" for u in range(D)})
    Ls.append({"dens": " + ".join(f"exs_{u}" for u in range(D))})
    Ls.append({f"o_{j}": " + ".join(f"(exs_{u} / dens) * v_{u}_{j}"
                                    for u in range(D))
               for j in range(dm)})
    Ls += _grn_layers("g3", "g3_", [f"o_{j}" for j in range(dm)], p)
    Ls.append({f"f_{d}": f"g2t{D-1}_{d} + g3_{d}" for d in range(dm)})
    Ls += _ln_layers("fl", [f"f_{d}" for d in range(dm)], p["ga"], p["ba_"])
    Ls += _grn_layers("gh", "gh1_", [f"fl_{d}" for d in range(dm)], p)
    Ls.append({"y": _dot([(f"gh_{d}", p["Wh1"][d]) for d in range(dm)],
                         float(p["ch1"]))})
    return Ls


# --------------------------------------------------------------------------
# BiLSTM + attention (models/lstm.py forward, recurrence UNROLLED)
# --------------------------------------------------------------------------

def lstm_forward_layers(raw: list[str], p: dict) -> list[dict[str, str]]:
    """Unlike the other cores the LSTM needs the attention block at EVERY
    position (the recurrence consumes the whole sequence), and the
    recurrence itself is unrolled: step t's gate pre-activations reference
    step t-1's hidden columns, which is exactly the layered-expression
    shape. Both engines have sigmoid-free exp and tanh, so the cell math
    is shared verbatim."""
    D = len(raw)
    dm, H, units = int(p["__meta"][1]), int(p["__meta"][2]), int(p["__meta"][3])
    dk = dm // H
    from predictor_spark.models.layers import positional_encoding

    pe = positional_encoding(D, dm)
    Ls: list[dict[str, str]] = []
    Ls.append({f"x{t}": f"({raw[t]}) / 100.0" for t in range(D)})
    Ls.append({f"e_{t}_{d}":
               f"x{t} * {_lit(p['We'][0, d])} + {_lit(p['be'][d] + pe[t, d])}"
               for t in range(D) for d in range(dm)})
    kv = {}
    for h in range(H):
        for t in range(D):
            for j in range(dk):
                kv[f"q{h}_{t}_{j}"] = _dot([(f"e_{t}_{d}", p[f"Wq{h}"][d, j])
                                            for d in range(dm)])
                kv[f"k{h}_{t}_{j}"] = _dot([(f"e_{t}_{d}", p[f"Wk{h}"][d, j])
                                            for d in range(dm)])
                kv[f"v{h}_{t}_{j}"] = _dot([(f"e_{t}_{d}", p[f"Wv{h}"][d, j])
                                            for d in range(dm)])
    Ls.append(kv)
    scale = 1.0 / np.sqrt(dk)
    Ls.append({f"s{h}_{t}_{u}":
               "(" + " + ".join(f"q{h}_{t}_{j} * k{h}_{u}_{j}" for j in range(dk))
               + f") * {_lit(scale)}"
               for h in range(H) for t in range(D) for u in range(D)})
    Ls.append({f"m{h}_{t}":
               "greatest(" + ", ".join(f"s{h}_{t}_{u}" for u in range(D)) + ")"
               for h in range(H) for t in range(D)})
    Ls.append({f"ex{h}_{t}_{u}": f"exp(s{h}_{t}_{u} - m{h}_{t})"
               for h in range(H) for t in range(D) for u in range(D)})
    Ls.append({f"den{h}_{t}": " + ".join(f"ex{h}_{t}_{u}" for u in range(D))
               for h in range(H) for t in range(D)})
    Ls.append({f"o{h}_{t}_{j}":
               " + ".join(f"(ex{h}_{t}_{u} / den{h}_{t}) * v{h}_{u}_{j}"
                          for u in range(D))
               for h in range(H) for t in range(D) for j in range(dk)})
    Ls.append({f"r_{t}_{d}":
               f"e_{t}_{d} + (" + _dot(
                   [(f"o{h}_{t}_{j}", p["Wo"][h * dk + j, d])
                    for h in range(H) for j in range(dk)], p["bo"][d]) + ")"
               for t in range(D) for d in range(dm)})
    for t in range(D):
        Ls += _ln_layers(f"ln{t}", [f"r_{t}_{d}" for d in range(dm)],
                         p["g1"], p["bn1"])

    def unroll(tag: str, Wx, Wh, b, order):
        for step, t in enumerate(order):
            z = {}
            for gi, gate in enumerate(("i", "f", "g", "o")):
                for u in range(units):
                    col = gi * units + u
                    terms = [(f"ln{t}_{d}", Wx[d, col]) for d in range(dm)]
                    if step > 0:
                        tprev = order[step - 1]
                        terms += [(f"{tag}h_{tprev}_{v}", Wh[v, col])
                                  for v in range(units)]
                    z[f"{tag}z{gate}_{t}_{u}"] = _dot(terms, b[col])
            Ls.append(z)
            Ls.append({
                **{f"{tag}gi_{t}_{u}":
                   f"1.0 / (1.0 + exp(-{tag}zi_{t}_{u}))" for u in range(units)},
                **{f"{tag}gf_{t}_{u}":
                   f"1.0 / (1.0 + exp(-{tag}zf_{t}_{u}))" for u in range(units)},
                **{f"{tag}gg_{t}_{u}":
                   f"(1.0 - 2.0 / (exp(2.0 * {tag}zg_{t}_{u}) + 1.0))"
                   for u in range(units)},
                **{f"{tag}go_{t}_{u}":
                   f"1.0 / (1.0 + exp(-{tag}zo_{t}_{u}))" for u in range(units)},
            })
            Ls.append({f"{tag}c_{t}_{u}":
                       f"{tag}gi_{t}_{u} * {tag}gg_{t}_{u}"
                       + (f" + {tag}gf_{t}_{u} * {tag}c_{order[step-1]}_{u}"
                          if step > 0 else "")
                       for u in range(units)})
            # tanh via exp: this DuckDB build ships no tanh(); the
            # identity 1 - 2/(e^{2z}+1) is exact at the ends and loses
            # only ~1 ulp near zero, and both engines share the string
            Ls.append({f"{tag}h_{t}_{u}":
                       f"{tag}go_{t}_{u} * (1.0 - 2.0 / (exp(2.0 * {tag}c_{t}_{u}) + 1.0))"
                       for u in range(units)})

    unroll("F", p["Wf_x"], p["Wf_h"], p["bf"], list(range(D)))
    unroll("B", p["Wb_x"], p["Wb_h"], p["bb"], list(range(D - 1, -1, -1)))
    ctx = [(f"Fh_{D - 1}_{u}", p["Wh1"][u]) for u in range(units)] \
        + [(f"Bh_0_{u}", p["Wh1"][units + u]) for u in range(units)]
    Ls.append({"y": _dot(ctx, float(p["ch1"]))})
    return Ls


# --------------------------------------------------------------------------
# MIMO (models/mimo.py forward — joint multi-horizon cross-attention decode)
# --------------------------------------------------------------------------

def mimo_forward_layers(raw: list[str], p: dict,
                        horizons: tuple[int, ...] = (1, 3)) -> list[dict[str, str]]:
    """Emits EVERY horizon from the one shared encoder — the companion
    row returns (y1, y3) jointly, which is the MIMO contract itself."""
    D = len(raw)
    dm, taps = int(p["__meta"][1]), int(p["__meta"][2])
    dff = int(p["__meta"][3])
    Ls: list[dict[str, str]] = []
    Ls.append({f"x{t}": f"({raw[t]}) / 100.0" for t in range(D)})
    Ls.append({f"e_{t}_{d}": f"x{t} * {_lit(p['We'][0, d])}"
               + (f" + {_lit(p['be'][d])}" if p["be"][d] != 0.0 else "")
               for t in range(D) for d in range(dm)})
    conv = {}
    for t in range(D):
        for d in range(dm):
            terms = []
            for k in range(taps):
                if t - k >= 0:
                    terms += [(f"e_{t-k}_{i}", p[f"Wc{k}"][i, d])
                              for i in range(dm)]
            conv[f"zc_{t}_{d}"] = _dot(terms, p["bc"][d])
    Ls.append(conv)
    Ls.append({f"c_{t}_{d}":
               f"CASE WHEN zc_{t}_{d} > 0.0 THEN zc_{t}_{d} "
               f"ELSE exp(zc_{t}_{d}) - 1.0 END"
               for t in range(D) for d in range(dm)})
    kv = {}
    for t in range(D):
        for j in range(dm):
            kv[f"k_{t}_{j}"] = _dot([(f"c_{t}_{d}", p["Wk"][d, j])
                                     for d in range(dm)])
            kv[f"v_{t}_{j}"] = _dot([(f"c_{t}_{d}", p["Wv"][d, j])
                                     for d in range(dm)])
    Ls.append(kv)
    scale = 1.0 / np.sqrt(dm)
    for hz in horizons:
        q = p[f"q{hz}"]
        Ls.append({f"s{hz}_{t}":
                   "(" + " + ".join(f"k_{t}_{j} * {_lit(q[j])}"
                                    for j in range(dm))
                   + f") * {_lit(scale)}" for t in range(D)})
        Ls.append({f"sm{hz}": "greatest(" + ", ".join(f"s{hz}_{t}"
                                                      for t in range(D)) + ")"})
        Ls.append({f"ex{hz}_{t}": f"exp(s{hz}_{t} - sm{hz})" for t in range(D)})
        Ls.append({f"den{hz}": " + ".join(f"ex{hz}_{t}" for t in range(D))})
        Ls.append({f"ctx{hz}_{j}":
                   " + ".join(f"(ex{hz}_{t} / den{hz}) * v_{t}_{j}"
                              for t in range(D))
                   for j in range(dm)})
        Ls.append({f"z1{hz}_{j}": _dot([(f"ctx{hz}_{d}", p["W1"][d, j])
                                        for d in range(dm)], p["b1"][j])
                   for j in range(dff)})
        Ls.append({f"a1{hz}_{j}": f"greatest(z1{hz}_{j}, 0.0)"
                   for j in range(dff)})
        Ls.append({f"y{hz}": _dot([(f"a1{hz}_{j}", p[f"Wh{hz}"][j])
                                   for j in range(dff)], float(p[f"ch{hz}"]))})
    return Ls


# --------------------------------------------------------------------------
# composite (models/composite.py forward — three channel branches merged)
# --------------------------------------------------------------------------

def composite_forward_layers(raw: list[str], p: dict) -> list[dict[str, str]]:
    D = len(raw)
    bu, mu = int(p["__meta"][1]), int(p["__meta"][2])
    Ls: list[dict[str, str]] = []
    Ls.append({f"x{t}": f"({raw[t]}) / 100.0" for t in range(D)})
    # channel split: 3-tap MA (edges clamped), padded diff, residual
    sm = {}
    for t in range(D):
        if t == 0:
            sm[f"tr_{t}"] = "(x0 + x1 + x2) / 3.0"
        elif t == D - 1:
            sm[f"tr_{t}"] = f"(x{D-3} + x{D-2} + x{D-1}) / 3.0"
        else:
            sm[f"tr_{t}"] = f"(x{t-1} + x{t} + x{t+1}) / 3.0"
    Ls.append(sm)
    Ls.append({
        **{f"df_{t}": ("0.0" if t == 0 else f"x{t} - x{t-1}") for t in range(D)},
        **{f"rs_{t}": f"x{t} - tr_{t}" for t in range(D)},
    })
    for b in ("tr", "df", "rs"):
        Ls.append({f"{b}z0_{j}": _dot([(f"{b}_{t}", p[f"{b}W0"][t, j])
                                       for t in range(D)], p[f"{b}b0"][j])
                   for j in range(bu)})
        Ls.append({f"{b}a0_{j}": f"greatest({b}z0_{j}, 0.0)" for j in range(bu)})
        Ls.append({f"{b}z1_{j}": _dot([(f"{b}a0_{i}", p[f"{b}W1"][i, j])
                                       for i in range(bu)], p[f"{b}b1"][j])
                   for j in range(bu)})
        Ls.append({f"{b}a1_{j}": f"greatest({b}z1_{j}, 0.0)" for j in range(bu)})
    concat = [(f"{b}a1_{j}", bi * bu + j)
              for bi, b in enumerate(("tr", "df", "rs")) for j in range(bu)]
    Ls.append({f"zm_{j}": _dot([(c, p["Wm"][row, j]) for c, row in concat],
                               p["bm"][j])
               for j in range(mu)})
    Ls.append({f"am_{j}": f"greatest(zm_{j}, 0.0)" for j in range(mu)})
    Ls.append({"y": _dot([(f"am_{j}", p["Wh1"][j]) for j in range(mu)],
                         float(p["ch1"]))})
    return Ls
