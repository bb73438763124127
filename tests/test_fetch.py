"""HTTP (meta)tile fetcher (real A1) against a local WMS test server.

Reference semantics under test (``/root/reference/tilecloud_chain/
store/url.py:29-145``): 404/204 -> empty tile (vanishes), 2xx image ->
data, 2xx non-image -> body is the error, missing Content-Type ->
error unless allowed, connection errors retried; plus the WMS GetMap
URL construction of ``generate.py:525-573`` (BBOX grown by the
metatile buffer, STYLES defaulted, VERSION 1.3 SRS->CRS rename).

The test server renders GetMap requests with the repo's own
``render_geometries`` kernel, so a WMS-sourced ``generate_tiles`` run
must reproduce the point_hash golden counters exactly.
"""

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.functions.png import encode_png
from tilecloud_chain_ray.geom import MultiPoint, Point
from tilecloud_chain_ray.grid import SWISSGRID_5
from tilecloud_chain_ray.stages.fetch import HTTPFetcher, WMSLayout
from tilecloud_chain_ray.stages.render import layer_color, render_geometries

POINTS = MultiPoint((Point(600000, 200000), Point(530000, 150000)))

ERROR_XML = (
    '<?xml version="1.0"?><ServiceExceptionReport>'
    "<ServiceException>msWMSLoadGetMapParams(): unknown layer</ServiceException>"
    "</ServiceExceptionReport>"
)

_flaky_hits: dict[str, int] = {}


class _WmsHandler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        parts = urllib.parse.urlsplit(self.path)
        q = dict(urllib.parse.parse_qsl(parts.query))
        if parts.path == "/wms":
            bbox = tuple(float(v) for v in q["BBOX"].split(","))
            w, h = int(q["WIDTH"]), int(q["HEIGHT"])
            img = render_geometries(
                [POINTS], bbox, (w, h), layer_color(q["LAYERS"])
            )
            body = encode_png(img)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif parts.path == "/empty204":
            self.send_response(204)
            self.end_headers()
        elif parts.path == "/missing404":
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif parts.path == "/error_xml":
            body = ERROR_XML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.ogc.se_xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif parts.path == "/no_ct":
            # 200 with a body but no Content-Type header at all
            body = b"\x89raw-bytes"
            self.wfile.write(
                b"HTTP/1.1 200 OK\r\nContent-Length: "
                + str(len(body)).encode()
                + b"\r\nConnection: close\r\n\r\n"
                + body
            )
            self.close_connection = True
        elif parts.path == "/flaky":
            key = q.get("id", "x")
            _flaky_hits[key] = _flaky_hits.get(key, 0) + 1
            if _flaky_hits[key] == 1:
                # drop the connection mid-request -> client retries
                self.connection.close()
                self.close_connection = True
                return
            body = b"png-after-retry"
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif parts.path == "/boom":
            self.send_error(500, "internal error")
        else:
            self.send_error(404)


@pytest.fixture(scope="module")
def wms_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _WmsHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _layer(**kw):
    defaults = dict(
        name="point_hash",
        grid=SWISSGRID_5,
        geometries=(POINTS,),
        meta=True,
        meta_size=8,
        meta_buffer=128,
        min_resolution_seed=10,
    )
    defaults.update(kw)
    return Layer(**defaults)


def _url_batch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


# -- WMSLayout URL construction ------------------------------------------


def test_wms_layout_url():
    layer = _layer()
    layout = WMSLayout(
        "http://example.com/wms",
        layer,
        params={"map": "/etc/map", "BBOX": "ignored", "Styles": "mine"},
    )
    url = layout.url(1, 1, 1, 8)
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
    assert q["SERVICE"] == "WMS" and q["REQUEST"] == "GetMap"
    assert q["VERSION"] == "1.1.1" and "CRS" not in q
    assert q["SRS"] == "EPSG:21781"
    assert q["LAYERS"] == "point_hash"
    # reserved params dropped regardless of casing; STYLES defaulted
    assert q["STYLES"] == "default"
    assert q["map"] == "/etc/map"
    assert "ignored" not in url and "mine" not in url
    # size = n * tile_size + 2 * meta_buffer
    assert int(q["WIDTH"]) == 8 * 256 + 2 * 128 == int(q["HEIGHT"])
    # BBOX matches the buffered grid extent
    expected = layer.grid.extent(1, 1, 1, 8, border_px=128)
    got = tuple(float(v) for v in q["BBOX"].split(","))
    assert got == pytest.approx(expected, abs=1e-5)


def test_wms_layout_130_crs_and_multilayer_styles():
    layer = _layer()
    layout = WMSLayout(
        "http://example.com/wms?map=x", layer, layers="a,b", version="1.3.0"
    )
    url = layout.url(0, 0, 0, 1)
    assert url.count("?") == 1  # appended with '&', not a second '?'
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
    assert "SRS" not in q and q["CRS"] == "EPSG:21781"
    assert q["STYLES"] == "default,default"  # one per sub-layer
    assert q["map"] == "x"  # pre-existing query string preserved


# -- response handling (no Ray: call the actor directly) -----------------


def test_fetch_statuses(wms_server):
    f = HTTPFetcher(retries=0)
    out = f(
        _url_batch(
            [
                f"{wms_server}/empty204",
                f"{wms_server}/missing404",
                f"{wms_server}/error_xml",
                f"{wms_server}/no_ct",
                f"{wms_server}/boom",
            ]
        )
    )
    assert out["fetch_status"].to_pylist() == [
        "empty", "empty", "error", "error", "error",
    ]
    assert out["data"].to_pylist() == [None] * 5
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[1] is None
    assert "unknown layer" in errs[2]  # WMS exception body IS the error
    assert "Content-Type" in errs[3]
    assert errs[4].startswith("500:")


def test_fetch_ok_and_no_ct_allowed(wms_server):
    layer = _layer()
    layout = WMSLayout(f"{wms_server}/wms", layer)
    f = HTTPFetcher(layout)
    batch = pa.table(
        {
            "z": pa.array([3], pa.int32()),
            "x": pa.array([58], pa.int64()),
            "y": pa.array([70], pa.int64()),
            "n": pa.array([8], pa.int32()),
        }
    )
    out = f(batch)
    assert out["fetch_status"].to_pylist() == ["ok"]
    assert out["content_type"].to_pylist() == ["image/png"]
    data = out["data"][0].as_py()
    assert data.startswith(b"\x89PNG")
    # and the same bytes the local renderer would produce
    expected = encode_png(
        render_geometries(
            [POINTS],
            layer.grid.extent(3, 58, 70, 8, border_px=128),
            (8 * 256 + 256, 8 * 256 + 256),
            layer_color("point_hash"),
        )
    )
    assert data == expected

    lax = HTTPFetcher(allows_no_contenttype=True)
    out = lax(_url_batch([f"{wms_server}/no_ct"]))
    assert out["fetch_status"].to_pylist() == ["ok"]
    assert out["data"][0].as_py() == b"\x89raw-bytes"


def test_fetch_retries_connection_error(wms_server):
    f = HTTPFetcher(retries=2, backoff=0.01)
    out = f(_url_batch([f"{wms_server}/flaky?id=r1"]))
    assert out["fetch_status"].to_pylist() == ["ok"]
    assert out["data"][0].as_py() == b"png-after-retry"

    g = HTTPFetcher(retries=0)
    out = g(_url_batch([f"{wms_server}/flaky?id=r2"]))
    assert out["fetch_status"].to_pylist() == ["error"]
    # second attempt with fresh fetcher succeeds (server healed)
    out = g(_url_batch([f"{wms_server}/flaky?id=r2"]))
    assert out["fetch_status"].to_pylist() == ["ok"]


# -- end-to-end: WMS-sourced generate reproduces the golden --------------


@pytest.mark.usefixtures("ray_session")
def test_generate_tiles_from_wms_golden(wms_server, tmp_path):
    from tilecloud_chain_ray.pipelines.generate import generate_tiles

    layer = _layer()
    result = generate_tiles(
        layer,
        wms_url=f"{wms_server}/wms",
        out_wmts=str(tmp_path / "tiles"),
        wms_kwargs={"concurrency": 2, "requests_per_actor": 8},
    )
    assert result.summary == {
        "tiles_generated": 384,
        "tiles_dropped": 376,
        "tiles_stored": 8,
        "metatiles_dropped": 4,
        "metatiles_generated": 10,
    }


@pytest.mark.usefixtures("ray_session")
def test_generate_tiles_wms_errors_flow_inband(wms_server):
    from tilecloud_chain_ray.pipelines.generate import generate_tiles

    layer = _layer()
    result = generate_tiles(
        layer,
        wms_url=f"{wms_server}/error_xml",
        wms_kwargs={"concurrency": 1},
        with_summary=False,
    )
    rows = result.tiles.select_columns(["status", "error"]).take_all()
    # every metatile errored; rows pass through split un-expanded
    assert len(rows) == 10
    assert {r["status"] for r in rows} == {"error"}
    assert all("unknown layer" in r["error"] for r in rows)
