"""PipelineConfig surface tests (reference: configFile.py + the
runSimplification toggles)."""

import pytest

from osmnetfusion_ray.config import DEFAULT, PipelineConfig


class TestPipelineConfig:
    def test_defaults_match_reference_constants(self):
        from osmnetfusion_ray.stages.simplify import HIGHWAY_BUFFERS, HIGHWAY_RANKING

        assert DEFAULT.highway_ranking == HIGHWAY_RANKING
        assert DEFAULT.highway_buffers == HIGHWAY_BUFFERS
        assert DEFAULT.cluster_threshold == 50
        assert DEFAULT.max_angle_initial == 75.0
        assert DEFAULT.max_angle_prev == 60.0

    def test_from_dict_and_overrides(self):
        cfg = PipelineConfig.from_dict({"cluster_threshold": 10, "ptstops": False})
        assert cfg.cluster_threshold == 10
        assert cfg.ptstops is False
        cfg2 = cfg.with_overrides(amenity_radius_m=50.0)
        assert cfg2.amenity_radius_m == 50.0
        assert cfg2.cluster_threshold == 10

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config keys"):
            PipelineConfig.from_dict({"nope": 1})

    def test_toggles_control_enrichment(self, ray_session):
        from osmnetfusion_ray.pipelines.network import enriched_city

        cfg = PipelineConfig(landuse=False, ptstops=False, amenities=False,
                             signals=False, widths=False, elevation=False)
        nodes, edges = enriched_city(n=6, seed=42, cfg=cfg)
        cols = edges.schema().names
        assert "green_ratio" not in cols
        assert "pt_stop_on" not in cols
        assert "amenity_on" not in cols
        assert "width_cycle_path" not in cols
        # the always-on labels still present
        assert "bike_access" in cols and "cycleway_category" in cols
