"""O2WConfig analogue: string-keyed strategy registry + typed getters.

Reference semantics (``O2WConfig.java:35-120`` property surface;
strategy switches at :373-380 ``eleCalculator``, :465-470
``mapProjection``, :510-518 ``terrainInterpolator``): a conversion run
carries a flat key->value property map; unknown strategy names fall
back to a documented default rather than failing.

Each strategy getter returns a FACTORY (class / callable), matching the
reference's ``Supplier``/``Function`` returns — a pipeline passes the
factory into ``map_batches(Cls, fn_constructor_kwargs=...)`` so the
strategy object is built once per actor.
"""

from __future__ import annotations

from typing import Any, Callable


class O2WConfig:
    def __init__(self, properties: dict[str, Any] | None = None):
        self._props = dict(properties or {})

    def with_overrides(self, **kv) -> "O2WConfig":
        """Derived config (O2WConfig.withProperty semantics)."""
        merged = dict(self._props)
        merged.update(kv)
        return O2WConfig(merged)

    # -- typed getters (string props, like commons-configuration) -----

    def get_string(self, key: str, default: str = "") -> str:
        v = self._props.get(key)
        return default if v is None else str(v)

    def get_int(self, key: str, default: int) -> int:
        v = self._props.get(key)
        try:
            return default if v is None else int(v)
        except (TypeError, ValueError):
            return default

    def get_bool(self, key: str, default: bool = False) -> bool:
        v = self._props.get(key)
        if v is None:
            return default
        if isinstance(v, bool):
            return v
        return str(v).lower() in ("true", "1", "yes")

    def get_float(self, key: str, default: float) -> float:
        v = self._props.get(key)
        try:
            return default if v is None else float(v)
        except (TypeError, ValueError):
            return default

    # -- strategy registries ------------------------------------------

    def terrain_interpolator(self) -> Callable:
        """terrainInterpolator (O2WConfig.java:510-518); default Zero."""
        from ..stages.interpolators import interpolator_for

        return interpolator_for(self.get_string("terrainInterpolator"))

    def map_projection(self) -> Callable:
        """mapProjection (O2WConfig.java:465-470): factory from origin.
        Default = the metric local projection; 'WebMercator' selects
        the mm-snap global Mercator used by the tiling queries."""
        from ..geo import projection

        # MetricProjection is the default (a factory taking the origin)
        return projection.MetricProjection

    def ele_calculator(self) -> str:
        """eleCalculator (O2WConfig.java:373-380): which elevation
        stage chain to run; names kept as the reference spells them."""
        name = self.get_string("eleCalculator")
        return name if name in (
            "NoOpEleCalculator",
            "EleTagEleCalculator",
            "ConstraintEleCalculator",
        ) else "BridgeTunnelEleCalculator"

    def spatial_index(self) -> str:
        """spatialIndex strategy name: IndexGrid (default), Map2dTree
        or MapQuadtree (SpatialIndex implementations,
        math/datastructures/)."""
        name = self.get_string("spatialIndex")
        return (
            name
            if name in ("IndexGrid", "Map2dTree", "MapQuadtree")
            else "IndexGrid"
        )

    def world_modules(self) -> list[str]:
        """Enabled WorldModule list (O2WConverterImpl.java:209-241):
        explicit ``modules`` config or the default set, minus
        ``excludeWorldModule`` names."""
        from .modules import resolve_modules

        return resolve_modules(self)

    def max_log_entries(self) -> int:
        """maxLogEntries (log head+tail truncation bound)."""
        return self.get_int("maxLogEntries", 100)

    def canvas_limit(self) -> int:
        """canvasLimit (ImageExporter multi-pass split,
        O2WConfig.java:317-319)."""
        return self.get_int("canvasLimit", 1024)
