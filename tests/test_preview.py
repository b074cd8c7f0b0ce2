"""Preview server (GIMP-dialog analog) endpoint tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from mathmap_tpu.expression_db import default_db
from mathmap_tpu.preview import PreviewState, _make_handler
from http.server import ThreadingHTTPServer


@pytest.fixture(scope="module")
def server():
    img = np.zeros((16, 16, 4), np.float32)
    img[..., 3] = 1.0
    state = PreviewState(img, 16, default_db())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.read()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_page_and_library(server):
    page = _get(server + "/").decode()
    assert "mathmap_tpu preview" in page
    lib = json.loads(_get(server + "/library"))
    assert "Distorts" in lib and "fisheye" in lib["Distorts"]
    src = _get(server + "/filter/twirl").decode()
    assert "filter twirl" in src


def test_render_roundtrip_with_params(server):
    out = _post(server + "/render", {
        "source": "filter f (float k: 0-1 (0.25)) grayColor(k) end",
        "t": 0.0, "params": {},
    })
    assert "png" in out and len(out["png"]) > 100
    assert out["params"][0]["name"] == "k"
    out2 = _post(server + "/render", {
        "source": "filter f (float k: 0-1 (0.25)) grayColor(k) end",
        "t": 0.0, "params": {"k": 0.9},
    })
    assert out2["png"] != out["png"]


def test_render_error_reported(server):
    out = _post(server + "/render", {"source": "grayColor(1 +", "t": 0.0})
    assert "error" in out and "MMSyntaxError" in out["error"]


def test_upload_endpoint(server):
    """Image upload replaces the input (the drawable-selection analog)."""
    import base64
    import io

    from PIL import Image

    img = (np.random.RandomState(4).rand(20, 30, 4) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    out = _post(server + "/upload", {
        "data": base64.b64encode(buf.getvalue()).decode()})
    assert out == {"width": 30, "height": 20}
    # subsequent renders pick up the new input geometry
    r = _post(server + "/render", {"source": "origVal(xy)", "t": 0.0})
    assert (r["width"], r["height"]) == (30, 20)


def test_upload_animated_gif_becomes_animated_input(server):
    """A multi-frame GIF upload becomes an ANIMATED (T,H,W,4) input: the
    animate endpoint then maps input frames to output frames (the GIMP
    layer-stack animation analog)."""
    import base64
    import io

    from PIL import Image

    frames = [Image.fromarray(
        np.full((12, 18, 4), 30 + 180 * i, np.uint8), "RGBA").convert("P")
        for i in range(2)]
    buf = io.BytesIO()
    frames[0].save(buf, "GIF", save_all=True, append_images=frames[1:],
                   duration=100, loop=0)
    out = _post(server + "/upload", {
        "data": base64.b64encode(buf.getvalue()).decode()})
    assert out == {"width": 18, "height": 12}
    out = _post(server + "/animate", {"source": "origVal(xy)", "frames": 2})
    assert len(out["frames"]) == 2
    assert out["frames"][0] != out["frames"][1]  # distinct input frames


def test_animate_endpoint(server):
    out = _post(server + "/animate", {
        "source": "grayColor(t)", "frames": 4})
    assert len(out["frames"]) == 4
    # first and last frames differ (t sweeps)
    assert out["frames"][0] != out["frames"][-1]


def test_curve_lut_param_render(server):
    """A freehand-curve LUT (list of floats) flows through params."""
    lut = [min(1.0, i / 16) for i in range(64)]
    out = _post(server + "/render", {
        "source": "filter f (curve cv) grayColor(cv((x + X) / W)) end",
        "params": {"cv": lut}})
    assert "png" in out and not out.get("error")


def test_composer_page_and_palette(server):
    page = _get(server + "/composer").decode()
    assert "Composer" in page and "addNode" in page
    pal = json.loads(_get(server + "/palette"))
    assert "twirl" in pal
    assert any(p["kind"] == "image" for p in pal["twirl"]["params"])


def test_compose_endpoint_renders_graph(server):
    """Node-editor JSON -> composite source -> render (GTK composer-canvas
    analog; composition stays source-level inlining, SURVEY §3.4)."""
    req = {
        "nodes": [
            {"id": "a", "filter": "grayscale", "params": {"in": {"input": 0}}},
            {"id": "b", "filter": "twirl",
             "params": {"in": {"ref": "a"}, "angle": 5.0}},
        ],
        "output": "b",
    }
    out = _post(server + "/compose", req)
    assert not out.get("error"), out.get("error")
    assert "filter composed" in out["source"] and "img_b(xy)" in out["source"]
    assert "png" in out
    mmc = _post(server + "/compose_mmc", req)
    assert "(composer" in mmc["mmc"] and '"twirl"' in mmc["mmc"]


def test_compose_cycle_error(server):
    req = {
        "nodes": [
            {"id": "a", "filter": "twirl", "params": {"in": {"ref": "b"}}},
            {"id": "b", "filter": "twirl", "params": {"in": {"ref": "a"}}},
        ],
        "output": "b",
    }
    out = _post(server + "/compose", req)
    assert "cycle" in out.get("error", "")


def test_parse_mmc_roundtrip(server):
    """.mmc -> node-editor JSON (composer Load button): the graph saved by
    /compose_mmc must load back with identical structure."""
    req = {
        "nodes": [
            {"id": "a", "filter": "grayscale", "params": {"in": {"input": 0}}},
            {"id": "b", "filter": "twirl",
             "params": {"in": {"ref": "a"}, "angle": 5.0}},
        ],
        "output": "b",
    }
    mmc = _post(server + "/compose_mmc", req)["mmc"]
    g = _post(server + "/parse_mmc", {"mmc": mmc})
    assert not g.get("error"), g.get("error")
    assert g["output"] == "b"
    by_id = {n["id"]: n for n in g["nodes"]}
    assert by_id["b"]["filter"] == "twirl"
    assert by_id["b"]["params"]["in"] == {"ref": "a"}
    assert by_id["b"]["params"]["angle"] == 5.0
    assert by_id["a"]["params"]["in"] == {"input": 0}
    # layout: downstream node sits to the right of its dependency
    assert by_id["b"]["x"] > by_id["a"]["x"]
    # bad input surfaces an error, not a 500
    bad = _post(server + "/parse_mmc", {"mmc": "(not-composer)"})
    assert "composer" in bad.get("error", "")


def test_render_multi_image_filter(server):
    """A two-input filter binds the uploaded drawable to EVERY image param
    (review r3: extra image params failed to bind in the preview)."""
    data = _post(server + "/render", {
        "source": "filter blend2 (image a, image b) "
                  "lerp(0.5, a(xy), b(xy)) end", "t": 0.0, "params": {}})
    assert "png" in data, data


def test_bad_json_returns_error_response(server):
    """Malformed POST bodies get an error response, not a dead socket."""
    import urllib.error

    req = urllib.request.Request(server + "/render", b"{not json",
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            body = r.read()
    except urllib.error.HTTPError as e:
        body = e.read()
    assert "error" in json.loads(body)


def test_sweep_endpoint(server):
    """/sweep: N param steps over the one drawable in one device program
    (GUI twin of CLI --param-sweep); distinct param values must produce
    distinct frames, and bad specs come back as readable errors."""
    import base64

    src = ("filter tw (image in, float angle: 0-10 (3))\n"
           "  in(toXY(ra:[r, a + angle * (1 - r / R)]))\nend")
    out = _post(server + "/sweep", {
        "source": src, "param": "angle", "lo": 0.0, "hi": 6.0, "frames": 3})
    assert "error" not in out, out.get("error")
    assert len(out["frames"]) == 3
    f0 = base64.b64decode(out["frames"][0])
    f2 = base64.b64decode(out["frames"][2])
    assert f0 != f2  # the swept param changed the render
    # unknown param: one readable line, no traceback
    out = _post(server + "/sweep", {
        "source": src, "param": "nosuch", "lo": 0.0, "hi": 1.0, "frames": 2})
    assert "no such param" in out["error"] and "Traceback" not in out["error"]
    # non-numeric param kind
    src2 = "filter g (image in, color c) in(xy) * c end"
    out = _post(server + "/sweep", {
        "source": src2, "param": "c", "lo": 0.0, "hi": 1.0, "frames": 2})
    assert "only float/int" in out["error"]


def test_render_region_composites_in_place():
    """region=[x,y,w,h]: the GIMP-selection twin — the filter is applied
    to the selection only and composited in place; pixels outside the
    selection are the drawable's, inside they match the full render's
    crop (same world coordinates). Own server: module fixture state is
    order-dependent (uploads)."""
    import io
    from PIL import Image

    rng = np.random.RandomState(8)
    img = rng.rand(24, 32, 4).astype(np.float32)
    img[..., 3] = 1.0
    state = PreviewState(img, 24, default_db())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        src = "origVal(xy + xy:[0, 2 * sin(x / 3)])"
        full = _post(base + "/render", {"source": src, "t": 0.0})
        reg = _post(base + "/render", {"source": src, "t": 0.0,
                                       "region": [5, 3, 12, 10]})
        assert not reg.get("error"), reg.get("error")
        assert (reg["width"], reg["height"]) == (32, 24)  # full canvas

        def png(d):
            a = np.asarray(Image.open(io.BytesIO(
                __import__("base64").b64decode(d["png"]))))
            return a

        got, want = png(reg), png(full)
        np.testing.assert_array_equal(got[3:13, 5:17], want[3:13, 5:17])
        # outside: the drawable's bytes (u8-quantized float drawable)
        bg = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
        mask = np.zeros((24, 32, 1), bool)
        mask[3:13, 5:17] = True
        np.testing.assert_array_equal(np.where(mask, bg, got), bg)
        # out-of-canvas region: readable one-line error
        bad = _post(base + "/render", {"source": src, "t": 0.0,
                                       "region": [30, 0, 10, 4]})
        assert "exceeds" in bad.get("error", "")
    finally:
        srv.shutdown()
