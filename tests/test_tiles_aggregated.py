"""assign_tiles_aggregated must equal assign_tiles exactly — the
skew-proof formulation may not change a single tile assignment."""

import numpy as np
import pandas as pd
import pytest

from ingest_ray.config import EngineConfig
from ingest_ray.pipeline import ingest_features
from ingest_ray.synth import golden_documents, synth_documents
from ingest_ray.tiles import assign_tiles, assign_tiles_aggregated


def _cmp(feats, grid, leaf):
    a = (
        assign_tiles(feats, grid_divs=grid, leaf_capacity=leaf)
        .select_columns(["key", "tile_cell", "tile_path", "tile_depth"])
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    b = (
        assign_tiles_aggregated(feats, grid_divs=grid, leaf_capacity=leaf)
        .select_columns(["key", "tile_cell", "tile_path", "tile_depth"])
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    return a


@pytest.mark.usefixtures("ray_session")
def test_aggregated_equals_groupby_divide():
    import ray.data as rd

    # hotspot corpus: 20% of features in one 1°x1° cell → deep divides
    feats = ingest_features(
        rd.from_arrow(synth_documents(4000)), EngineConfig(join_mode="broadcast")
    ).materialize()
    for grid, leaf in (((8, 8), 20), ((4, 4), 7), ((2, 2), 100)):
        out = _cmp(feats, grid, leaf)
    # partition property: every feature exactly once
    assert out["key"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_aggregated_equals_on_golden():
    import ray.data as rd

    feats = ingest_features(
        rd.from_arrow(golden_documents()), EngineConfig(join_mode="broadcast")
    ).materialize()
    _cmp(feats, (2, 2), 2)
