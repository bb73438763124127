"""From-scratch CRS reprojection (no proj library in this environment).

The reference reprojects bboxes and geometries between arbitrary SRIDs
with pyproj transformer caches
(``/root/reference/tilecloud_chain/__init__.py:862-904``, proj4
literals ``__init__.py:838-860``).  This module re-implements the
subset its configs actually use — plus the common European families —
from **public formulas only**:

* ``longlat``          — geographic pass-through
* ``merc``             — Mercator, spherical & ellipsoidal
                         (EPSG:3857 Web Mercator is the a==b case)
* ``somerc``           — Swiss Oblique Mercator (EPSG:21781 / 2056),
                         EPSG Guidance Note 7-2 "Swiss style" formulas
* ``tmerc`` / ``utm``  — Transverse Mercator, Snyder USGS PP1395
                         eqs. 8-9..8-25 (UTM zones)
* ``lcc``              — Lambert Conformal Conic 1SP/2SP, Snyder
                         eqs. 15-1..15-11

Datum changes use the 3/7-parameter Helmert position-vector transform
(``+towgs84``) through geocentric XYZ, as classic proj4 does; grids
(``+nadgrids``) are not supported except the ``@null`` no-op used by
Web Mercator.  All transforms are vectorized over numpy arrays.

Sources: J.P. Snyder, *Map Projections — A Working Manual* (USGS
PP 1395, public domain); EPSG Guidance Note 7-2; swisstopo *Formulas
and constants for the calculation of the Swiss conformal cylindrical
projection* (used in tests as an independent cross-check).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

ARCSEC = math.pi / 648000.0  # arc-seconds -> radians
FORTPI = math.pi / 4.0
HALFPI = math.pi / 2.0

# name -> (a, 1/f); rf = 0 means sphere
ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "bessel": (6377397.155, 299.1528128),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80": (6378249.145, 293.465),
    "krass": (6378245.0, 298.3),
    "sphere": (6370997.0, 0.0),
}

# mirrors the reference's get_proj4_literal table
# (/root/reference/tilecloud_chain/__init__.py:838-860) + 4326
EPSG_LITERALS: dict[int, str] = {
    4326: "+proj=longlat +datum=WGS84 +no_defs",
    3857: (
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0.0 +lon_0=0.0 "
        "+x_0=0.0 +y_0=0.0 +k=1.0 +units=m +nadgrids=@null +wktext +no_defs +over"
    ),
    21781: (
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 "
        "+x_0=600000 +y_0=200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346,0,0,0,0 +units=m +no_defs"
    ),
    2056: (
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 "
        "+x_0=2600000 +y_0=1200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346,0,0,0,0 +units=m +no_defs"
    ),
    2154: (
        "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
        "+y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs"
    ),
    25832: (
        "+proj=utm +zone=32 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs"
    ),
    32632: "+proj=utm +zone=32 +datum=WGS84 +units=m +no_defs",
}


def get_proj4_literal(srs: int | str) -> str:
    """proj4 literal for an SRS (``"EPSG:21781"`` or ``21781``)."""
    if isinstance(srs, str):
        srs = int(srs.split(":")[-1])
    lit = EPSG_LITERALS.get(srs)
    if lit is None:
        raise ValueError(f"EPSG:{srs} not in the built-in literal table; pass a proj4 literal")
    return lit


def parse_proj4(literal: str) -> dict:
    """proj4 string -> parameter dict (numbers parsed, flags True)."""
    params: dict = {}
    for tok in literal.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            try:
                params[k] = float(v) if k != "towgs84" else tuple(
                    float(p) for p in v.split(",")
                )
            except ValueError:
                params[k] = v
        else:
            params[tok] = True
    if "init" in params:
        init = str(params.pop("init"))
        base = parse_proj4(get_proj4_literal(init))
        base.update(params)
        params = base
    if params.get("datum") == "WGS84":
        params.setdefault("ellps", "WGS84")
        params.setdefault("towgs84", (0.0,) * 7)
    if params.get("proj") == "utm":
        zone = int(params["zone"])
        params["lon_0"] = zone * 6.0 - 183.0
        params.setdefault("lat_0", 0.0)
        params.setdefault("k_0", 0.9996)
        params.setdefault("x_0", 500000.0)
        params.setdefault("y_0", 10000000.0 if params.get("south") else 0.0)
        params["proj"] = "tmerc"
    return params


def _ellipsoid(params: dict) -> tuple[float, float]:
    """(a, es) from the params (explicit a/b beats +ellps)."""
    if "a" in params:
        a = float(params["a"])
        if "b" in params:
            b = float(params["b"])
            es = 1.0 - (b * b) / (a * a)
        elif "rf" in params and params["rf"]:
            f = 1.0 / float(params["rf"])
            es = f * (2 - f)
        else:
            es = 0.0
        return a, es
    name = params.get("ellps", "WGS84")
    a, rf = ELLIPSOIDS[str(name)]
    if rf == 0.0:
        return a, 0.0
    f = 1.0 / rf
    return a, f * (2 - f)


# ---------------------------------------------------------------------------
# projections: forward(lon, lat) -> (x, y), inverse(x, y) -> (lon, lat)
# all angles in RADIANS; offsets x_0/y_0 applied by the projection
# ---------------------------------------------------------------------------


class _LongLat:
    def __init__(self, params: dict) -> None:
        pass

    def forward(self, lon, lat):
        return np.degrees(lon), np.degrees(lat)

    def inverse(self, x, y):
        return np.radians(x), np.radians(y)


class _Mercator:
    """Snyder eqs 7-6..7-10 (ellipsoidal), 7-1..7-5 (spherical)."""

    def __init__(self, params: dict) -> None:
        self.a, self.es = _ellipsoid(params)
        self.e = math.sqrt(self.es)
        self.lon0 = math.radians(params.get("lon_0", 0.0))
        self.x0 = params.get("x_0", 0.0)
        self.y0 = params.get("y_0", 0.0)
        lat_ts = math.radians(params.get("lat_ts", 0.0))
        k = params.get("k_0", params.get("k", 1.0))
        if lat_ts:
            if self.es:
                k = math.cos(lat_ts) / math.sqrt(1 - self.es * math.sin(lat_ts) ** 2)
            else:
                k = math.cos(lat_ts)
        self.k0 = k

    def forward(self, lon, lat):
        ak = self.a * self.k0
        x = ak * (lon - self.lon0)
        if self.es:
            esin = self.e * np.sin(lat)
            y = ak * (
                np.log(np.tan(FORTPI + lat / 2))
                - self.e / 2 * np.log((1 + esin) / (1 - esin))
            )
        else:
            y = ak * np.log(np.tan(FORTPI + lat / 2))
        return x + self.x0, y + self.y0

    def inverse(self, x, y):
        ak = self.a * self.k0
        lon = (np.asarray(x, np.float64) - self.x0) / ak + self.lon0
        t = np.exp(-(np.asarray(y, np.float64) - self.y0) / ak)
        lat = HALFPI - 2 * np.arctan(t)
        if self.es:
            for _ in range(12):
                esin = self.e * np.sin(lat)
                lat = HALFPI - 2 * np.arctan(
                    t * ((1 - esin) / (1 + esin)) ** (self.e / 2)
                )
        return lon, lat


class _SwissObliqueMercator:
    """EPSG GN 7-2 Swiss Oblique Mercator (proj ``somerc``)."""

    def __init__(self, params: dict) -> None:
        self.a, self.es = _ellipsoid(params)
        self.e = math.sqrt(self.es)
        phi0 = math.radians(params.get("lat_0", 0.0))
        self.lon0 = math.radians(params.get("lon_0", 0.0))
        self.x0 = params.get("x_0", 0.0)
        self.y0 = params.get("y_0", 0.0)
        k0 = params.get("k_0", params.get("k", 1.0))
        cp2 = math.cos(phi0) ** 2
        self.c = math.sqrt(1 + self.es * cp2 * cp2 / (1 - self.es))
        sinp0 = math.sin(phi0) / self.c
        self.phip0 = math.asin(sinp0)
        sp = self.e * math.sin(phi0)
        self.K = math.log(math.tan(FORTPI + self.phip0 / 2)) - self.c * (
            math.log(math.tan(FORTPI + phi0 / 2))
            - self.e / 2 * math.log((1 + sp) / (1 - sp))
        )
        self.kR = k0 * self.a * math.sqrt(1 - self.es) / (1 - sp * sp)

    def _conformal(self, lat):
        esin = self.e * np.sin(lat)
        return (
            self.c
            * (
                np.log(np.tan(FORTPI + lat / 2))
                - self.e / 2 * np.log((1 + esin) / (1 - esin))
            )
            + self.K
        )

    def forward(self, lon, lat):
        phip = 2 * np.arctan(np.exp(self._conformal(lat))) - HALFPI
        lamp = self.c * (lon - self.lon0)
        cp = np.cos(phip)
        phipp = np.arcsin(
            math.cos(self.phip0) * np.sin(phip)
            - math.sin(self.phip0) * cp * np.cos(lamp)
        )
        lampp = np.arcsin(np.clip(cp * np.sin(lamp) / np.cos(phipp), -1, 1))
        x = self.kR * lampp + self.x0
        y = self.kR * np.log(np.tan(FORTPI + phipp / 2)) + self.y0
        return x, y

    def inverse(self, x, y):
        phipp = 2 * (
            np.arctan(np.exp((np.asarray(y, np.float64) - self.y0) / self.kR)) - FORTPI
        )
        lampp = (np.asarray(x, np.float64) - self.x0) / self.kR
        cp = np.cos(phipp)
        phip = np.arcsin(
            math.cos(self.phip0) * np.sin(phipp)
            + math.sin(self.phip0) * cp * np.cos(lampp)
        )
        lamp = np.arcsin(np.clip(cp * np.sin(lampp) / np.cos(phip), -1, 1))
        lon = self.lon0 + lamp / self.c
        # invert the conformal latitude: fixed point on
        # q(lat) = (log tan(pi/4+phip/2) - K) / c
        t = (np.log(np.tan(FORTPI + phip / 2)) - self.K) / self.c
        lat = phip
        for _ in range(12):
            esin = self.e * np.sin(lat)
            lat = (
                2
                * np.arctan(
                    np.exp(t + self.e / 2 * np.log((1 + esin) / (1 - esin)))
                )
                - HALFPI
            )
        return lon, lat


class _TransverseMercator:
    """Snyder PP1395 eqs 8-9..8-25 (series, mm-level within UTM widths)."""

    def __init__(self, params: dict) -> None:
        self.a, self.es = _ellipsoid(params)
        self.ep2 = self.es / (1 - self.es)
        self.lat0 = math.radians(params.get("lat_0", 0.0))
        self.lon0 = math.radians(params.get("lon_0", 0.0))
        self.k0 = params.get("k_0", params.get("k", 1.0))
        self.x0 = params.get("x_0", 0.0)
        self.y0 = params.get("y_0", 0.0)
        e2 = self.es
        self._mcoef = (
            1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256,
            3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024,
            15 * e2**2 / 256 + 45 * e2**3 / 1024,
            35 * e2**3 / 3072,
        )
        self.M0 = self._mdist(self.lat0)
        e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
        self._fcoef = (
            3 * e1 / 2 - 27 * e1**3 / 32,
            21 * e1**2 / 16 - 55 * e1**4 / 32,
            151 * e1**3 / 96,
            1097 * e1**4 / 512,
        )

    def _mdist(self, lat):
        c0, c2, c4, c6 = self._mcoef
        return self.a * (
            c0 * lat - c2 * np.sin(2 * lat) + c4 * np.sin(4 * lat) - c6 * np.sin(6 * lat)
        )

    def forward(self, lon, lat):
        lat = np.asarray(lat, np.float64)
        sl, cl = np.sin(lat), np.cos(lat)
        N = self.a / np.sqrt(1 - self.es * sl * sl)
        T = (sl / cl) ** 2
        C = self.ep2 * cl * cl
        A = (np.asarray(lon, np.float64) - self.lon0) * cl
        M = self._mdist(lat)
        x = self.k0 * N * (
            A
            + (1 - T + C) * A**3 / 6
            + (5 - 18 * T + T * T + 72 * C - 58 * self.ep2) * A**5 / 120
        )
        y = self.k0 * (
            M
            - self.M0
            + N
            * sl
            / cl
            * (
                A * A / 2
                + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
                + (61 - 58 * T + T * T + 600 * C - 330 * self.ep2) * A**6 / 720
            )
        )
        return x + self.x0, y + self.y0

    def inverse(self, x, y):
        M = self.M0 + (np.asarray(y, np.float64) - self.y0) / self.k0
        mu = M / (self.a * self._mcoef[0])
        f1, f2, f3, f4 = self._fcoef
        phi1 = (
            mu
            + f1 * np.sin(2 * mu)
            + f2 * np.sin(4 * mu)
            + f3 * np.sin(6 * mu)
            + f4 * np.sin(8 * mu)
        )
        sl, cl = np.sin(phi1), np.cos(phi1)
        C1 = self.ep2 * cl * cl
        T1 = (sl / cl) ** 2
        N1 = self.a / np.sqrt(1 - self.es * sl * sl)
        R1 = self.a * (1 - self.es) / (1 - self.es * sl * sl) ** 1.5
        D = (np.asarray(x, np.float64) - self.x0) / (N1 * self.k0)
        lat = phi1 - (N1 * sl / cl / R1) * (
            D * D / 2
            - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * self.ep2) * D**4 / 24
            + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * self.ep2 - 3 * C1 * C1)
            * D**6
            / 720
        )
        lon = self.lon0 + (
            D
            - (1 + 2 * T1 + C1) * D**3 / 6
            + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * self.ep2 + 24 * T1 * T1)
            * D**5
            / 120
        ) / cl
        return lon, lat


class _LambertConformalConic:
    """Snyder PP1395 eqs 15-1..15-11 (1SP and 2SP)."""

    def __init__(self, params: dict) -> None:
        self.a, self.es = _ellipsoid(params)
        self.e = math.sqrt(self.es)
        lat0 = math.radians(params.get("lat_0", 0.0))
        self.lon0 = math.radians(params.get("lon_0", 0.0))
        self.x0 = params.get("x_0", 0.0)
        self.y0 = params.get("y_0", 0.0)
        k0 = params.get("k_0", params.get("k", 1.0))
        lat1 = math.radians(params.get("lat_1", math.degrees(lat0)))
        lat2 = math.radians(params.get("lat_2", math.degrees(lat1)))

        def m(phi):
            return math.cos(phi) / math.sqrt(1 - self.es * math.sin(phi) ** 2)

        def t(phi):
            esin = self.e * math.sin(phi)
            return math.tan(FORTPI - phi / 2) / ((1 - esin) / (1 + esin)) ** (self.e / 2)

        if abs(lat1 - lat2) > 1e-12:
            self.n = (math.log(m(lat1)) - math.log(m(lat2))) / (
                math.log(t(lat1)) - math.log(t(lat2))
            )
        else:
            self.n = math.sin(lat1)
        self.F = m(lat1) / (self.n * t(lat1) ** self.n) * k0
        self.rho0 = self.a * self.F * t(lat0) ** self.n

    def _t(self, lat):
        esin = self.e * np.sin(lat)
        return np.tan(FORTPI - lat / 2) / ((1 - esin) / (1 + esin)) ** (self.e / 2)

    def forward(self, lon, lat):
        rho = self.a * self.F * self._t(np.asarray(lat, np.float64)) ** self.n
        theta = self.n * (np.asarray(lon, np.float64) - self.lon0)
        x = rho * np.sin(theta) + self.x0
        y = self.rho0 - rho * np.cos(theta) + self.y0
        return x, y

    def inverse(self, x, y):
        xp = np.asarray(x, np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, np.float64) - self.y0)
        rho = np.sign(self.n) * np.hypot(xp, yp)
        theta = np.arctan2(np.sign(self.n) * xp, np.sign(self.n) * yp)
        lon = theta / self.n + self.lon0
        tt = (rho / (self.a * self.F)) ** (1.0 / self.n)
        lat = HALFPI - 2 * np.arctan(tt)
        for _ in range(12):
            esin = self.e * np.sin(lat)
            lat = HALFPI - 2 * np.arctan(
                tt * ((1 - esin) / (1 + esin)) ** (self.e / 2)
            )
        return lon, lat


_PROJECTIONS = {
    "longlat": _LongLat,
    "latlong": _LongLat,
    "merc": _Mercator,
    "somerc": _SwissObliqueMercator,
    "tmerc": _TransverseMercator,
    "lcc": _LambertConformalConic,
}


# ---------------------------------------------------------------------------
# datum shift (Helmert position-vector through geocentric XYZ)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Datum:
    a: float
    es: float
    towgs84: tuple[float, ...] | None  # 3 or 7 params, None = unknown/no-op


def _geodetic_to_xyz(lon, lat, a, es):
    sl = np.sin(lat)
    N = a / np.sqrt(1 - es * sl * sl)
    cl = np.cos(lat)
    return N * cl * np.cos(lon), N * cl * np.sin(lon), N * (1 - es) * sl


def _xyz_to_geodetic(X, Y, Z, a, es):
    lon = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    lat = np.arctan2(Z, p * (1 - es))
    for _ in range(12):
        sl = np.sin(lat)
        N = a / np.sqrt(1 - es * sl * sl)
        lat = np.arctan2(Z + es * N * sl, p)
    return lon, lat


def _helmert(X, Y, Z, p: tuple[float, ...], inverse: bool = False):
    dx, dy, dz = p[0], p[1], p[2]
    rx = ry = rz = 0.0
    s = 0.0
    if len(p) >= 7:
        rx, ry, rz = (v * ARCSEC for v in p[3:6])
        s = p[6] * 1e-6
    m = 1.0 + s
    if not inverse:
        X2 = m * (X - rz * Y + ry * Z) + dx
        Y2 = m * (rz * X + Y - rx * Z) + dy
        Z2 = m * (-ry * X + rx * Y + Z) + dz
        return X2, Y2, Z2
    # inverse of the (small-angle) position-vector transform
    Xs, Ys, Zs = (X - dx) / m, (Y - dy) / m, (Z - dz) / m
    X2 = Xs + rz * Ys - ry * Zs
    Y2 = -rz * Xs + Ys + rx * Zs
    Z2 = ry * Xs - rx * Ys + Zs
    return X2, Y2, Z2


def _datum_of(params: dict) -> _Datum:
    if params.get("nadgrids") == "@null":
        # Web-Mercator convention: geodetic coords are taken as WGS84
        # unchanged regardless of the (spherical) projection constants
        a, rf = ELLIPSOIDS["WGS84"]
        f = 1.0 / rf
        return _Datum(a, f * (2 - f), (0.0,) * 7)
    a, es = _ellipsoid(params)
    t = params.get("towgs84")
    if t is not None:
        t = tuple(float(v) for v in t)
        if all(v == 0.0 for v in t):
            t = (0.0,) * 7
    return _Datum(a, es, t)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _build(literal_src: str, literal_dst: str) -> "Transformer":
    return Transformer(parse_proj4(literal_src), parse_proj4(literal_dst))


class Transformer:
    """src -> dst coordinate transform, vectorized (always_xy order)."""

    def __init__(self, src: dict, dst: dict) -> None:
        from tilecloud_chain_ray.ntv2 import lookup_grid

        self.src_proj = _PROJECTIONS[str(src["proj"])](src)
        self.dst_proj = _PROJECTIONS[str(dst["proj"])](dst)
        self.src_datum = _datum_of(src)
        self.dst_datum = _datum_of(dst)
        # NTv2 grid shifts (+nadgrids=<file-or-registered-name>): a
        # grid REPLACES the side's towgs84, classic proj4 semantics
        self.src_grid = (
            lookup_grid(str(src["nadgrids"])) if "nadgrids" in src else None
        )
        self.dst_grid = (
            lookup_grid(str(dst["nadgrids"])) if "nadgrids" in dst else None
        )
        same_ellps = (
            abs(self.src_datum.a - self.dst_datum.a) < 1e-9
            and abs(self.src_datum.es - self.dst_datum.es) < 1e-15
        )
        s_t, d_t = self.src_datum.towgs84, self.dst_datum.towgs84
        # classic proj4: no shift when both datums agree (or neither is
        # specified); otherwise missing towgs84 counts as zeros
        self.shift = (
            self.src_grid is not None
            or self.dst_grid is not None
            or not (same_ellps and (s_t == d_t or (s_t is None and d_t is None)))
        )

    @classmethod
    def from_proj4(cls, literal_src: str, literal_dst: str) -> "Transformer":
        return _build(literal_src, literal_dst)

    @classmethod
    def from_srs(cls, src: int | str, dst: int | str) -> "Transformer":
        return _build(get_proj4_literal(src), get_proj4_literal(dst))

    def transform(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon, lat = self.src_proj.inverse(x, y)
        if self.shift:
            sd, dd = self.src_datum, self.dst_datum
            if self.src_grid is None and self.dst_grid is None:
                # pure Helmert chain stays in XYZ (no intermediate
                # geodetic iteration)
                X, Y, Z = _geodetic_to_xyz(lon, lat, sd.a, sd.es)
                if sd.towgs84 and any(sd.towgs84):
                    X, Y, Z = _helmert(X, Y, Z, sd.towgs84)
                if dd.towgs84 and any(dd.towgs84):
                    X, Y, Z = _helmert(X, Y, Z, dd.towgs84, inverse=True)
                lon, lat = _xyz_to_geodetic(X, Y, Z, dd.a, dd.es)
            else:
                # grid-aware path pivots through WGS84 geodetic
                a_w, rf_w = ELLIPSOIDS["WGS84"]
                f_w = 1.0 / rf_w
                es_w = f_w * (2 - f_w)
                if self.src_grid is not None:
                    lon, lat = self.src_grid.shift(lon, lat)
                elif sd.towgs84 and any(sd.towgs84):
                    X, Y, Z = _geodetic_to_xyz(lon, lat, sd.a, sd.es)
                    X, Y, Z = _helmert(X, Y, Z, sd.towgs84)
                    lon, lat = _xyz_to_geodetic(X, Y, Z, a_w, es_w)
                if self.dst_grid is not None:
                    lon, lat = self.dst_grid.shift(lon, lat, inverse=True)
                elif dd.towgs84 and any(dd.towgs84):
                    X, Y, Z = _geodetic_to_xyz(lon, lat, a_w, es_w)
                    X, Y, Z = _helmert(X, Y, Z, dd.towgs84, inverse=True)
                    lon, lat = _xyz_to_geodetic(X, Y, Z, dd.a, dd.es)
        return self.dst_proj.forward(lon, lat)


def normalize_bbox(bbox) -> list[float]:
    """[minx, miny, maxx, maxy] regardless of input corner order
    (reference ``normalize_bbox`` ``__init__.py:862-870``)."""
    return [
        min(float(bbox[0]), float(bbox[2])),
        min(float(bbox[1]), float(bbox[3])),
        max(float(bbox[0]), float(bbox[2])),
        max(float(bbox[1]), float(bbox[3])),
    ]


def transform_bbox(src_literal: str, dst_literal: str, bbox, densify: int = 21) -> list[float]:
    """Reference ``transform_bbox`` (``__init__.py:873-904``): normalize,
    short-circuit same-CRS, else transform a densified boundary and take
    the envelope (matches pyproj ``transform_bounds`` semantics for
    non-wrapping cases)."""
    nb = normalize_bbox(bbox)
    if src_literal == dst_literal:
        return nb
    minx, miny, maxx, maxy = nb
    t = np.linspace(0.0, 1.0, densify)
    xs = np.concatenate(
        [
            minx + t * (maxx - minx),  # bottom
            np.full(densify, maxx),  # right
            maxx + t * (minx - maxx),  # top
            np.full(densify, minx),  # left
        ]
    )
    ys = np.concatenate(
        [
            np.full(densify, miny),
            miny + t * (maxy - miny),
            np.full(densify, maxy),
            maxy + t * (miny - maxy),
        ]
    )
    tx, ty = Transformer.from_proj4(src_literal, dst_literal).transform(xs, ys)
    return [float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())]


def transform_geometry(geometry, transformer: Transformer):
    """Reproject a geom.Geometry through ``transformer`` (new object)."""
    from tilecloud_chain_ray.geom import (
        GeometryCollection,
        LineString,
        MultiLineString,
        MultiPoint,
        MultiPolygon,
        Point,
        Polygon,
    )

    def ring(arr):
        x, y = transformer.transform(arr[:, 0], arr[:, 1])
        return np.column_stack([x, y])

    if isinstance(geometry, Point):
        x, y = transformer.transform(geometry.x, geometry.y)
        return Point(float(x), float(y))
    if isinstance(geometry, MultiPoint):
        return MultiPoint(tuple(transform_geometry(p, transformer) for p in geometry.points))
    if isinstance(geometry, LineString):
        return LineString(ring(geometry.coords))
    if isinstance(geometry, MultiLineString):
        return MultiLineString(tuple(transform_geometry(l, transformer) for l in geometry.lines))
    if isinstance(geometry, Polygon):
        return Polygon(ring(geometry.shell), [ring(h) for h in geometry.holes])
    if isinstance(geometry, MultiPolygon):
        return MultiPolygon(tuple(transform_geometry(p, transformer) for p in geometry.polygons))
    if isinstance(geometry, GeometryCollection):
        return GeometryCollection(
            tuple(transform_geometry(g, transformer) for g in geometry.geometries)
        )
    raise TypeError(f"unsupported geometry {type(geometry)}")
