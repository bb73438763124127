"""Legend dedup (G5).

The reference renders a legend per resolution and keeps one image per
*run* of consecutive resolutions with identical sha1, placing the break
at the geometric mean of the adjacent resolutions
(``/root/reference/tilecloud_chain/controller.py:318-378``).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass


@dataclass(frozen=True)
class LegendBand:
    image: bytes
    min_resolution: float | None  # None = unbounded
    max_resolution: float | None


def dedup_legends(
    images_per_resolution: list[tuple[float, bytes]],
) -> list[LegendBand]:
    """Collapse consecutive identical legend images into bands.

    Input: (resolution, image) pairs, resolutions descending (zoom
    order).  Output bands carry min/max resolution bounds with breaks
    at geometric means, reference semantics.
    """
    if not images_per_resolution:
        return []
    bands: list[LegendBand] = []
    run_start = 0
    digests = [hashlib.sha1(img).hexdigest() for _, img in images_per_resolution]
    resolutions = [r for r, _ in images_per_resolution]
    for i in range(1, len(digests) + 1):
        if i < len(digests) and digests[i] == digests[run_start]:
            continue
        max_res = (
            None
            if run_start == 0
            else math.sqrt(resolutions[run_start - 1] * resolutions[run_start])
        )
        min_res = (
            None
            if i == len(digests)
            else math.sqrt(resolutions[i - 1] * resolutions[i])
        )
        bands.append(
            LegendBand(
                image=images_per_resolution[run_start][1],
                min_resolution=min_res,
                max_resolution=max_res,
            )
        )
        run_start = i
    return bands
