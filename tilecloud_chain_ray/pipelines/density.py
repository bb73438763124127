"""Page-density tile pyramid: the graft flagship (north rule).

geocoded rows -> per-cell counts at the finest resolution (ONE shuffle,
pre-aggregated inside map_batches so only (cell, partial_count) rows
move) -> per-zoom rollups of the (small) count table -> data-driven
tile rows (only tiles that contain data — a z-14 pyramid never
enumerates its empty tiles) -> DensityRenderer -> hash-drop -> sinks.

Tile/pixel alignment: 256-px tiles on a 2^z matrix (WEBMERC) make a
pixel at zoom z exactly a cell at res z+8, so per-pixel counts are
cell-count rollups — no re-binning of raw rows per zoom.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.functions.cells import cell_decode, cell_id
from tilecloud_chain_ray.sinks.wmts import WmtsWriter, summarize
from tilecloud_chain_ray.stages.hashdrop import (
    empty_signatures,
    finalize_tiles,
    make_hash_dropper,
)
from tilecloud_chain_ray.stages.render import DensityRenderer


def cell_counts(
    ds: ray.data.Dataset, cell_col: str = "cell", count_col: str = "n"
) -> ray.data.Dataset:
    """Per-cell row counts with in-batch pre-aggregation (combiner)."""

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.Table.from_pydict(
            {
                cell_col: pa.array(uniq.astype(np.int64), pa.int64()),
                count_col: pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby(cell_col).aggregate(Sum(count_col, alias_name=count_col))


def rollup_to_zoom(counts: ray.data.Dataset, zoom: int) -> ray.data.Dataset:
    """Cell counts at res R -> (z, tx, ty, pcol, prow, n) pixel rows.

    pcol/prow are the pixel offsets inside the 256-px tile; cells finer
    than z+8 collapse (partial-sum + groupby on the already-small count
    table)."""

    def to_pixels(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch["n"].to_numpy(zero_copy_only=False)
        res, cx, cy = cell_decode(cells)
        pixel_res = zoom + 8
        shift = (res - pixel_res).astype(np.int64)
        if (shift < 0).any():
            raise ValueError(f"cell res {res.min()} coarser than pixel res {pixel_res}")
        px = (cx >> shift).astype(np.int64)
        py = (cy >> shift).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "z": pa.array(np.full(len(px), zoom, dtype=np.int32), pa.int32()),
                "tx": pa.array(px >> 8, pa.int64()),
                "ty": pa.array(py >> 8, pa.int64()),
                "pcol": pa.array(px & 255, pa.int64()),
                "prow": pa.array(py & 255, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    pixel_rows = counts.map_batches(to_pixels, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return pixel_rows.groupby(["z", "tx", "ty", "pcol", "prow"]).aggregate(
        Sum("n", alias_name="n")
    )


def tiles_with_pixels(pixel_counts: ray.data.Dataset) -> ray.data.Dataset:
    """Group pixel rows into one row per tile with pixel list columns."""

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "z": [np.int32(group["z"].iloc[0])],
                "x": [np.int64(group["tx"].iloc[0])],
                "y": [np.int64(group["ty"].iloc[0])],
                "n": [np.int32(1)],
                "pixel_cols": [group["pcol"].to_numpy().astype(np.int64)],
                "pixel_rows": [group["prow"].to_numpy().astype(np.int64)],
                "pixel_counts": [group["n"].to_numpy().astype(np.int64)],
            }
        )

    return pixel_counts.groupby(["z", "tx", "ty"]).map_groups(
        collect, batch_format="pandas"
    )


def density_pyramid(
    geocoded: ray.data.Dataset,
    layer: Layer,
    zooms: Sequence[int],
    cell_col: str = "cell",
    out_wmts: str | None = None,
    out_parquet: str | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    with_summary: bool = True,
):
    """Full density pyramid for the given zooms (finest first not
    required).  Returns (tiles_dataset, summary_dict)."""
    from tilecloud_chain_ray.pipelines.generate import GenerateResult

    assert not layer.meta, "density tiles are rendered per-tile (meta=False)"
    counts = cell_counts(geocoded, cell_col=cell_col).materialize()  # small: <= #distinct cells

    per_zoom = [tiles_with_pixels(rollup_to_zoom(counts, z)) for z in zooms]
    tile_rows = per_zoom[0] if len(per_zoom) == 1 else per_zoom[0].union(*per_zoom[1:])
    tile_rows = tile_rows.map_batches(
        lambda b: b.append_column("layer", pa.array([layer.name] * b.num_rows, pa.string()))
        .append_column("grid", pa.array([layer.grid.name] * b.num_rows, pa.string())),
        batch_format="pyarrow",
    )

    _, empty_tile = empty_signatures(layer)
    rendered = tile_rows.map_batches(
        DensityRenderer,
        fn_constructor_kwargs={"layer": layer},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
    tiles = rendered.map_batches(
        make_hash_dropper(layer.empty_tile or empty_tile, "dropped"),
        batch_format="pyarrow",
    )
    tiles = tiles.map_batches(finalize_tiles, batch_format="pyarrow")
    if out_wmts is not None:
        tiles = tiles.map_batches(
            WmtsWriter,
            fn_constructor_kwargs={"layer": layer, "root": out_wmts},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    if out_parquet is not None:
        tiles.write_parquet(out_parquet, partition_cols=["z"])
        tiles = ray.data.read_parquet(out_parquet)
    summary = summarize(tiles, layer.meta_size, meta=False) if with_summary else {}
    return GenerateResult(tiles=tiles, summary=summary)
