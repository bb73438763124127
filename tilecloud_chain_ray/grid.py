"""Tile-grid math: the WMTS z/x/y pyramid arithmetic.

Re-derives (from public semantics, verified against the reference's test
goldens) the tile-matrix arithmetic of ``tilecloud_chain``:

* grid construction / resolution scale inference —
  ``/root/reference/tilecloud_chain/__init__.py:1293-1319,1656-1676``
* meters -> tile index and tile index -> meter extent (top-down y axis,
  origin at ``bbox[3]``) — FreeTileGrid semantics as exercised by
  ``tests/test_generate.py:813-837`` (``--get-bbox`` goldens) and the
  stored-tile coordinates of ``tests/test_generate.py:1281-1316``.
* matrix limits — ``/root/reference/tilecloud_chain/__init__.py:815-835``.

All arithmetic is done in *scaled-integer resolution space*: a ``scale``
is inferred so that every ``resolution * scale`` is integral (prime
factorization of the ``Fraction`` denominators, mirroring
``__init__.py:1293-1319``), which keeps tile spans exact for resolutions
like 0.1 or 2.5 and makes the floor/ceil index math reproducible in
float64 numpy at scale.

Coordinate conventions (identical to the reference / WMTS):

* ``x`` = column index, counted from ``bbox[0]`` (left edge), 0-based.
* ``y`` = row index, counted **top-down** from ``bbox[3]`` (top edge).
* A metatile coordinate is the coordinate of its top-left child tile
  with span ``n`` (so meta x/y are multiples of ``n``).
* The WMTS REST path is ``{matrix}/{row}/{col}`` = ``z/y/x``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from fractions import Fraction

import numpy as np

TILE_SIZE_DEFAULT = 256


def _prime_factors(x: int) -> list[int]:
    factors = []
    p = 2
    while p * p <= x:
        while x % p == 0:
            factors.append(p)
            x //= p
        p += 1
    if x > 1:
        factors.append(x)
    return factors


def resolution_scale(resolutions: tuple[float, ...] | list[float]) -> int:
    """Smallest integer scale making every resolution*scale integral.

    Mirrors ``TileGeneration._resolution_scale``
    (``/root/reference/tilecloud_chain/__init__.py:1304-1319``): LCM of
    the denominators of the resolutions expressed as exact fractions of
    their decimal string representation.
    """
    exponents: dict[int, int] = {}
    for resolution in resolutions:
        denominator = Fraction(str(resolution)).denominator
        factors = _prime_factors(denominator)
        for p in set(factors):
            exponents[p] = max(exponents.get(p, 0), factors.count(p))
    scale = 1
    for p, e in exponents.items():
        scale *= p**e
    # Resolutions with long decimal expansions (e.g. web-mercator
    # 156543.03392804097) would need an astronomically large scale; exact
    # integer spans only pay off for "nice" decimal resolutions, so fall
    # back to plain float math beyond this bound.
    if scale > 10**6:
        return 1
    return scale


@dataclass(frozen=True)
class Grid:
    """A WMTS tile matrix set (one resolution per zoom, shared bbox).

    Equivalent of the reference's grid config entity
    (``/root/reference/tilecloud_chain/configuration.py:973-1051``).
    """

    name: str
    resolutions: tuple[float, ...]  # descending, index = zoom
    bbox: tuple[float, float, float, float]  # minx, miny, maxx, maxy
    srs: str = "EPSG:21781"
    tile_size: int = TILE_SIZE_DEFAULT
    matrix_identifier: str = "zoom"  # "zoom" | "resolution"
    # proj4 literal for reprojection (reference grids carry
    # ``proj4_literal``, configuration.py:1040-1051); defaults to the
    # built-in table lookup for ``srs`` when needed
    proj4_literal: str | None = None
    scale: int = field(init=False)

    def proj4(self) -> str:
        """The grid's proj4 literal (explicit or from the srs table)."""
        if self.proj4_literal:
            return self.proj4_literal
        from tilecloud_chain_ray.proj import get_proj4_literal

        return get_proj4_literal(self.srs)

    def __post_init__(self) -> None:
        assert list(self.resolutions) == sorted(self.resolutions, reverse=True), (
            "resolutions must be descending (zoom 0 = coarsest)"
        )
        object.__setattr__(self, "scale", resolution_scale(self.resolutions))

    # -- scalar helpers -------------------------------------------------

    def res_scaled(self, zoom: int) -> float:
        """Resolution at ``zoom`` multiplied by ``self.scale``.

        An exact integer whenever ``scale > 1`` (nice decimal
        resolutions); plain float otherwise.
        """
        if self.scale == 1:
            return self.resolutions[zoom]
        r = self.resolutions[zoom] * self.scale
        ri = round(r)
        assert abs(r - ri) < 1e-9, (self.resolutions[zoom], self.scale)
        return float(ri)

    def span(self, zoom: int, n: int = 1) -> float:
        """Tile (or metatile, span ``n``) edge length in map units."""
        return self.tile_size * n * self.res_scaled(zoom) / self.scale

    def matrix_dims(self, zoom: int, n: int = 1) -> tuple[int, int]:
        """(width, height) of the matrix in (meta)tiles of span ``n``.

        ``ceil(extent / span)`` as in ``__init__.py:534-536`` (sparse) and
        ``get_tile_matrix_limits`` (``__init__.py:815-835``).
        """
        s = self.span(zoom, n)
        width = math.ceil((self.bbox[2] - self.bbox[0]) / s)
        height = math.ceil((self.bbox[3] - self.bbox[1]) / s)
        return width, height

    def matrix_id(self, zoom: int) -> str:
        """Path segment for the zoom: ``"3"`` or ``"0_1"`` (resolution mode).

        Resolution formatting per the observed golden paths of
        ``tests/test_generate.py:1102-1184`` (1 -> "1", 0.2 -> "0_2").
        """
        if self.matrix_identifier == "resolution":
            r = self.resolutions[zoom]
            txt = f"{r:g}"
            return txt.replace(".", "_")
        return str(zoom)

    def tile_index(self, zoom: int, mx: float, my: float) -> tuple[int, int]:
        """Map coords (meters) -> (x=col, y=row top-down) tile index."""
        s = self.span(zoom)
        x = math.floor((mx - self.bbox[0]) / s)
        y = math.floor((self.bbox[3] - my) / s)
        return x, y

    def extent(
        self,
        zoom: int,
        x: int,
        y: int,
        n: int = 1,
        border_px: float = 0.0,
    ) -> tuple[float, float, float, float]:
        """(Meta)tile index -> map extent, optionally grown by ``border_px``.

        ``border_px`` is in *pixels* and is multiplied by the zoom's
        resolution — this reproduces FreeTileGrid.extent as called by the
        reference's geometry filter (``__init__.py:2670-2672``), including
        the quirk that the filter passes ``resolution * px_buffer`` as the
        border, yielding an effective map-unit buffer of
        ``px_buffer * resolution**2``.  Verified against the 10-metatile
        golden of ``tests/test_generate.py:1281-1316``.
        """
        res = self.res_scaled(zoom) / self.scale
        ts = self.tile_size
        minx = self.bbox[0] + (ts * x - border_px) * res
        maxx = self.bbox[0] + (ts * (x + n) + border_px) * res
        maxy = self.bbox[3] - (ts * y - border_px) * res
        miny = self.bbox[3] - (ts * (y + n) + border_px) * res
        return minx, miny, maxx, maxy

    # -- vectorized helpers (hot path: map_batches over Arrow batches) ---

    def tile_index_np(
        self, zoom: int, mx: np.ndarray, my: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized ``tile_index`` over numpy arrays of map coords."""
        s = self.span(zoom)
        x = np.floor((mx - self.bbox[0]) / s).astype(np.int64)
        y = np.floor((self.bbox[3] - my) / s).astype(np.int64)
        return x, y

    def zooms(self) -> range:
        return range(len(self.resolutions))


# The reference test fixture grids (tests/tilegeneration/test-nosns.yaml:1-27)
# re-expressed in code; used by our conformance tests and the demo pipelines.
SWISSGRID_5 = Grid(
    name="swissgrid_5",
    resolutions=(100, 50, 20, 10, 5),
    bbox=(420000, 30000, 900000, 350000),
    srs="EPSG:21781",
)
SWISSGRID_01 = Grid(
    name="swissgrid_01",
    resolutions=(1, 0.2, 0.1),
    bbox=(420000, 30000, 900000, 350000),
    srs="EPSG:21781",
    matrix_identifier="resolution",
)
SWISSGRID_2_5 = Grid(
    name="swissgrid_2_5",
    resolutions=(2.5,),
    bbox=(420000, 30000, 900000, 350000),
    srs="EPSG:21781",
    matrix_identifier="resolution",
)
# Web-mercator pyramid for the web-page grafts (zoom 0-14), standard
# 2**z × 2**z matrices over the EPSG:3857 square.
_WEBMERC_HALF = 20037508.342789244
WEBMERC = Grid(
    name="webmerc",
    resolutions=tuple(2 * _WEBMERC_HALF / (256 * 2**z) for z in range(15)),
    bbox=(-_WEBMERC_HALF, -_WEBMERC_HALF, _WEBMERC_HALF, _WEBMERC_HALF),
    srs="EPSG:3857",
)


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 (spherical mercator), vectorized.

    Pure math (no pyproj in this environment); standard public formula.
    """
    x = lon * (_WEBMERC_HALF / 180.0)
    lat = np.clip(lat, -85.05112877980659, 85.05112877980659)
    y = np.log(np.tan((90.0 + lat) * (math.pi / 360.0))) * (_WEBMERC_HALF / math.pi)
    return x, y
