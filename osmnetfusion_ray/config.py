"""Declarative pipeline configuration — the engine's equivalent of the
reference's module-level config surface (configFile.py: ranking :171-186,
buffers :189-222, thresholds :225-227, tag universe :54-104) and the step
toggles of runSimplification.runSimplification (runSimplification.py:11-47).

Every behavior knob is a field on one frozen dataclass; stages take a
``cfg`` and read from it, so a custom config is injected by constructing a
``PipelineConfig(...)`` (the reference's ``load_config(fp_config)``
equivalent is ``PipelineConfig.from_dict(json.load(...))``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace


def _default_ranking() -> dict:
    from .stages.simplify import HIGHWAY_RANKING

    return dict(HIGHWAY_RANKING)


def _default_buffers() -> dict:
    from .stages.simplify import HIGHWAY_BUFFERS

    return dict(HIGHWAY_BUFFERS)


@dataclass(frozen=True)
class PipelineConfig:
    # ranking / buffering (configFile.py:171-206)
    highway_ranking: dict = field(default_factory=_default_ranking)
    highway_buffers: dict = field(default_factory=_default_buffers)
    # simplification thresholds (configFile.py:188,225-228)
    cluster_threshold: int = 50
    max_angle_initial: float = 75.0
    max_angle_prev: float = 60.0
    # enrichment step toggles (runSimplification.py:11-47)
    landuse: bool = True
    signals: bool = True
    widths: bool = True
    amenities: bool = True
    ptstops: bool = True
    elevation: bool = True
    # spatial-join radii (p2_enrichData.py:454,506,561; buffer defaults)
    signal_snap_m: float = 20.0
    stop_snap_m: float = 30.0
    amenity_radius_m: float = 200.0
    # page-join (north_star flagship)
    page_buffer_m: float = 50.0
    page_max_snap_m: float = 500.0
    # reference latitude of the local equirectangular metric used by every
    # per-batch spatial index (one GLOBAL value so thresholds are independent
    # of partitioning; default = center of the Munich-style BBOX)
    ref_lat: float = 48.15

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**d)

    def with_overrides(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT = PipelineConfig()
