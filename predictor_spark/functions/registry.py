"""Transform/estimator registry — the engine's plugin system
(SURVEY §2.10: the reference resolves five entry-point groups via
importlib.metadata; `app/plugin_loader.py:12-48`).

Same contract, Spark-native: a named registry of transform factories per
group. Third parties register via ``@register("predictor", "mymodel")``
or the ``predictor_spark.plugins`` importlib entry point (loaded lazily);
every registered transform is a ``Callable[..., DataFrame]`` or an MLlib
Estimator factory, and carries its declared params like the reference's
``plugin_params`` class attr.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

GROUPS = ("predictor", "optimizer", "pipeline", "preprocessor", "target")


@dataclass
class PluginSpec:
    name: str
    group: str
    factory: Callable
    params: dict = field(default_factory=dict)


_REGISTRY: dict[str, dict[str, PluginSpec]] = {g: {} for g in GROUPS}


def register(group: str, name: str, params: dict | None = None):
    """Decorator: register a transform/estimator factory under (group, name)."""
    if group not in _REGISTRY:
        raise ValueError(f"unknown plugin group {group!r}; expected one of {GROUPS}")

    def deco(factory: Callable) -> Callable:
        _REGISTRY[group][name] = PluginSpec(name, group, factory, dict(params or {}))
        return factory

    return deco


def get(group: str, name: str) -> PluginSpec:
    try:
        return _REGISTRY[group][name]
    except KeyError:
        _load_entry_points(group)
        if name in _REGISTRY.get(group, {}):
            return _REGISTRY[group][name]
        raise KeyError(f"no {group} plugin named {name!r}; "
                       f"registered: {sorted(_REGISTRY.get(group, {}))}") from None


def available(group: str) -> list[str]:
    _load_entry_points(group)
    return sorted(_REGISTRY[group])


def _load_entry_points(group: str) -> None:
    """Resolve external plugins from the ``predictor_spark.{group}s``
    entry-point group (plugin_loader.py:12-48 analog). Best-effort: absent
    metadata machinery or no installed plugins is not an error."""
    try:  # pragma: no cover - exercised only with installed third-party plugins
        from importlib.metadata import entry_points

        for ep in entry_points().select(group=f"predictor_spark.{group}s"):
            if ep.name not in _REGISTRY[group]:
                factory = ep.load()
                _REGISTRY[group][ep.name] = PluginSpec(ep.name, group, factory)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# built-in registrations (the engine's equivalents of setup.py:7-48)
# ---------------------------------------------------------------------------

def _builtin() -> None:
    from predictor_spark.operators import temporal
    from predictor_spark.plans import ar_model, mllib_model, pipeline

    register("predictor", "persistence",
             params={"note": "pred := baseline (naive)"})(lambda df, **kw: df)
    register("predictor", "ar1", params={"train_end": None, "horizon": 1})(ar_model.ar1_fit_predict)
    register("predictor", "mllib_linear",
             params={"feature_cols": ["value"]})(mllib_model.fit_linear_forecaster)
    from predictor_spark.models import estimator as _nbeats_est

    register("predictor", "nbeats",
             params={"window": 8, "horizons": (1,), "mc_samples": 0})(
        _nbeats_est.nbeats_fit_predict_per_series)
    register("pipeline", "forecast", params=dict(pipeline.DEFAULTS))(pipeline.run_forecast_pipeline)
    register("preprocessor", "log_returns")(temporal.log_returns)
    register("preprocessor", "window_tensorize")(temporal.window_tensorize)
    register("target", "lead_targets")(temporal.lead_targets)


_builtin()
