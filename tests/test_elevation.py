"""ST3 DEM sampler tests: deterministic grid, bilinear sampling, actor-pool
pipeline integration."""

import numpy as np
import pandas as pd

from osmnetfusion_ray.stages.elevation import DEFAULT_BBOX, DEMSampler, synthetic_dem


class TestSyntheticDEM:
    def test_deterministic(self):
        assert np.array_equal(synthetic_dem(seed=42), synthetic_dem(seed=42))
        assert not np.array_equal(synthetic_dem(seed=42), synthetic_dem(seed=7))

    def test_plausible_range(self):
        g = synthetic_dem()
        assert 400 < g.min() < g.max() < 600


class TestDEMSampler:
    def test_sample_matches_grid_nodes(self):
        s = DEMSampler(res=64)
        lon0, lat0, lon1, lat1 = DEFAULT_BBOX
        # exactly on grid points → exact grid values
        xs = np.linspace(lon0, lon1, 64)[[0, 10, 63]]
        ys = np.linspace(lat0, lat1, 64)[[0, 20, 63]]
        v = s.sample(xs, ys)
        for k, (i, j) in enumerate(zip([0, 10, 63], [0, 20, 63])):
            assert v[k] == np.round(s.grid[j, i], 2)

    def test_bilinear_between(self):
        s = DEMSampler(res=64)
        lon0, lat0, lon1, lat1 = DEFAULT_BBOX
        mid = s.sample(np.array([(lon0 + lon1) / 2]), np.array([(lat0 + lat1) / 2]))
        assert 400 < mid[0] < 600

    def test_batch_call(self):
        s = DEMSampler()
        df = pd.DataFrame({"osmid": [1, 2], "x": [11.55, 11.60], "y": [48.13, 48.17]})
        out = s(df)
        assert "elevation" in out.columns
        assert out["elevation"].notna().all()


class TestDEMEnrichment:
    def test_gradient_from_dem_pipeline(self, ray_session):
        from osmnetfusion_ray.config import PipelineConfig
        from osmnetfusion_ray.pipelines.enrich import enrich_network
        from osmnetfusion_ray.pipelines.network import build_network_inputs

        nodes_ds, edges_ds, dims, osmids = build_network_inputs(n=6, seed=42)
        dims = {k: v for k, v in dims.items() if k != "elevations"}  # force DEM path
        _, edges = enrich_network(nodes_ds, edges_ds, dims, osmids,
                                  cfg=PipelineConfig(ptstops=False, amenities=False,
                                                     signals=False, widths=False,
                                                     landuse=False))
        df = edges.to_pandas()
        assert "gradient" in df.columns and "severity" in df.columns
        assert df["gradient"].notna().all()
        assert (df["gradient"] >= 0).all()
