"""Production serving component (mathmap_tpu/serve.py): micro-batching
correctness + HTTP endpoints (SURVEY §2.1 front-end rows' production
analog; docs/SERVING.md)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import mathmap_tpu as mm
from mathmap_tpu.serve import RenderService, make_handler

H, W = 24, 32


@pytest.fixture(scope="module")
def service():
    svc = RenderService(max_batch=8, window_ms=30.0)
    yield svc
    svc.shutdown()


def _img(seed=0):
    return np.random.RandomState(seed).rand(H, W, 4).astype(np.float32)


def _match_u8(got, direct_f32):
    """Service results are device-packed uint8 (output_dtype='uint8'
    default); the float render packed on host must agree to <=1 count
    (the lone-vs-batched float paths differ by ~1e-6, which can flip an
    8-bit rounding boundary)."""
    from mathmap_tpu.imgio.images import to_uint8

    got = np.asarray(got)
    assert got.dtype == np.uint8
    exp = to_uint8(np.asarray(direct_f32))
    diff = np.abs(got.astype(np.int16) - exp.astype(np.int16))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_render_sync_matches_direct(service):
    img = _img()
    out = service.render_sync("twirl", [img], W, H, t=0.3,
                              params={"angle": 2.0})
    filt = mm.default_db().compile("twirl")
    direct = filt.render(img, width=W, height=H, t=0.3,
                         params={"angle": 2.0})
    _match_u8(out, direct)


def test_concurrent_jobs_microbatch_and_match(service):
    """N concurrent same-signature jobs coalesce into batched dispatches
    and each result equals its per-frame render."""
    imgs = [_img(s) for s in range(6)]
    ts = [0.1 * (i + 1) for i in range(6)]
    before = service.snapshot()["dispatches"]
    results = [None] * 6

    def go(i):
        results[i] = service.render_sync("pond", [imgs[i]], W, H, t=ts[i])

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    after = service.snapshot()
    # at least one dispatch grouped >1 job (the 30 ms window is wide)
    assert any(int(k) > 1 for k in after["batch_hist"]), after["batch_hist"]
    assert after["dispatches"] - before < 6, "no batching happened"
    filt = mm.default_db().compile("pond")
    for i in range(6):
        direct = filt.render(imgs[i], width=W, height=H, t=ts[i])
        _match_u8(results[i], direct)


def test_per_job_param_values_batch_and_match(service):
    """Same-filter jobs whose param VALUES differ still coalesce (grouping
    keys on param NAMES; render_batch takes a per-job params list) and
    each result equals its own per-frame render."""
    img = _img(9)
    angles = [1.0, 2.5, 4.0, 5.5]
    before = service.snapshot()["dispatches"]
    results = [None] * len(angles)

    def go(i):
        results[i] = service.render_sync("twirl", [img], W, H,
                                         params={"angle": angles[i]})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    after = service.snapshot()
    assert after["dispatches"] - before < 4, "no batching across values"
    filt = mm.default_db().compile("twirl")
    for i, a in enumerate(angles):
        direct = filt.render(img, width=W, height=H, params={"angle": a})
        _match_u8(results[i], direct)
    r1 = np.asarray(results[0]).astype(np.int16)
    r2 = np.asarray(results[2]).astype(np.int16)
    assert np.abs(r1 - r2).max() > 1  # values actually took effect


def test_render_batch_params_list_api():
    """Filter.render_batch accepts a per-job params list; mismatched names
    or lengths raise."""
    filt = mm.default_db().compile("twirl")
    imgs = np.stack([_img(s) for s in range(3)])
    outs = filt.render_batch(imgs, ts=[0.1, 0.2, 0.3], width=W, height=H,
                             params=[{"angle": a} for a in (1.0, 3.0, 5.0)])
    for i, a in enumerate((1.0, 3.0, 5.0)):
        direct = filt.render(imgs[i], width=W, height=H, t=0.1 * (i + 1),
                             params={"angle": a})
        np.testing.assert_allclose(outs[i], np.asarray(direct), atol=1e-6)
    with pytest.raises(ValueError, match="param dicts"):
        filt.render_batch(imgs, ts=[0.1, 0.2, 0.3], width=W, height=H,
                          params=[{"angle": 1.0}])
    with pytest.raises(ValueError, match="same"):
        filt.render_batch(imgs, ts=[0.1, 0.2, 0.3], width=W, height=H,
                          params=[{"angle": 1.0}, {}, {"angle": 2.0}])


def test_error_propagates(service):
    with pytest.raises(Exception):
        service.render_sync("no_such_filter_xyz", [], W, H)


def test_source_spec_compiles(service):
    out = service.render_sync(
        {"source": "filter f () grayColor(0.25) end"}, [], W, H)
    # 0.25 packs to round(0.25 * 255) = 64 under the service's u8 output
    assert out.dtype == np.uint8
    assert (out[..., 0] == 64).all()


# -- HTTP front end ----------------------------------------------------

@pytest.fixture(scope="module")
def http_server(service):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(arr[..., :3], 0, 1) * 255).astype(np.uint8)
                    ).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_http_healthz_stats(http_server):
    code, body = _get(http_server, "/healthz")
    assert code == 200 and body["ok"] is True
    code, body = _get(http_server, "/stats")
    assert code == 200 and "dispatches" in body


def test_http_render_roundtrip(http_server):
    from PIL import Image

    img = _img(3)
    code, body = _post(http_server, "/render", {
        "filter": "twirl", "width": W, "height": H, "t": 0.2,
        "params": {"angle": 3.0}, "inputs": [_png_b64(img)]})
    assert code == 200, body
    png = base64.b64decode(body["image"])
    arr = np.asarray(Image.open(io.BytesIO(png)))
    assert arr.shape == (H, W, 4)


def test_http_render_png_level(http_server):
    from PIL import Image

    src = {"source": "filter f () grayColor(x / W + 0.5) end"}
    outs = {}
    for level in (0, 1):
        code, body = _post(http_server, "/render", {
            "filter": src, "width": W, "height": H, "png_level": level})
        assert code == 200, body
        outs[level] = base64.b64decode(body["image"])
    # store mode is bigger but decodes to the identical frame
    assert len(outs[0]) > len(outs[1])
    a0 = np.asarray(Image.open(io.BytesIO(outs[0])))
    a1 = np.asarray(Image.open(io.BytesIO(outs[1])))
    np.testing.assert_array_equal(a0, a1)


def test_http_render_raw_format(http_server):
    code, body = _post(http_server, "/render", {
        "filter": {"source": "filter f () grayColor(x / W + 0.5) end"},
        "width": W, "height": H, "format": "raw"})
    assert code == 200, body
    assert body["dtype"] == "uint8"  # the service's 4x-smaller raw wire
    arr = np.frombuffer(base64.b64decode(body["data"]),
                        np.dtype(body["dtype"])).reshape(body["shape"])
    assert arr.shape == (H, W, 4)
    assert arr[0, -1, 0] > arr[0, 0, 0]  # ramps left -> right


def test_http_bad_requests(http_server):
    code, body = _post(http_server, "/render", {"width": W})  # no filter
    assert code == 400 and "error" in body
    code, body = _post(http_server, "/render", {
        "filter": "twirl (", "width": W, "height": H})
    assert code == 400
    code, body = _post(http_server, "/nope", {})
    assert code == 404


def test_http_warmup(http_server):
    code, body = _post(http_server, "/warmup", {
        "filter": "pond", "width": W, "height": H})
    assert code == 200 and body["ok"] is True


def test_animate_sync_matches_render_animation(service):
    img = _img(7)
    frames = service.animate_sync("ripple", [img], W, H, num_frames=3)
    filt = mm.default_db().compile("ripple")
    direct = filt.render_animation(img, num_frames=3, width=W, height=H)
    _match_u8(frames, direct)


def test_http_animate_gif(http_server):
    from PIL import Image

    code, body = _post(http_server, "/animate", {
        "filter": "ripple", "width": W, "height": H, "num_frames": 3,
        "inputs": [_png_b64(_img(2))]})
    assert code == 200, body
    gif = Image.open(io.BytesIO(base64.b64decode(body["gif"])))
    assert gif.n_frames == 3


def test_dispatch_pads_to_bucket_and_frame_zero(service):
    """A non-power-of-2 group pads to the next bucket (program-count bound)
    and batched jobs render at frame=0 — identical to their lone twins,
    even for a filter that READS the frame internal."""
    from mathmap_tpu.serve import _Job

    src = ("filter fr (image in) "
           "in(xy) * 0.5 + grayColor(frame * 0.1) * 0.5 end")
    filt = service.get_filter({"source": src})
    imgs = [_img(s) for s in (11, 12, 13)]  # 3 jobs -> bucket 4
    jobs = [_Job(sig="s", filt=filt, inputs=[imgs[i]], t=0.2 * i, params={},
                 width=W, height=H, options=mm.RenderOptions())
            for i in range(3)]
    service._dispatch(jobs)
    hist = service.snapshot()["batch_hist"]
    assert "3" in hist  # the GROUP size is what's recorded
    for i, j in enumerate(jobs):
        assert j.error is None, j.error
        direct = filt.render(imgs[i], width=W, height=H, t=0.2 * i)
        np.testing.assert_allclose(j.result, np.asarray(direct), atol=1e-6)
        assert np.asarray(j.result).dtype == np.float32  # explicit opts
        #                      (direct _dispatch skips the submit override)


def test_warmup_batch_sizes(service):
    """warmup(batch_sizes=...) precompiles the batched program: a following
    grouped dispatch reuses it (smoke: no error, correct output)."""
    filt = service.warmup("pond", W, H, batch_sizes=(1, 2))
    imgs = np.stack([_img(20), _img(21)])
    outs = filt.render_batch(imgs, ts=[0.3, 0.4],
                             frames=np.zeros(2, np.float32),
                             width=W, height=H, params=[{}, {}])
    direct = filt.render(imgs[1], width=W, height=H, t=0.4)
    np.testing.assert_allclose(outs[1], np.asarray(direct), atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_concurrent_mixed_programs_no_crosstalk(service, seed):
    """Fuzz the dispatcher's GROUPING boundary: 12 concurrent jobs across 4
    RANDOM source programs with per-job params/t/inputs — jobs may only
    coalesce within their (program, geometry, options) group, and every
    result must equal its direct render. A grouping-key bug (cross-program
    batch, param bleed between groups) fails the parity check."""
    from tests.test_fuzz import ExprGen

    rng = np.random.RandomState(40 + seed)
    sources = []
    for k in range(4):
        body = ExprGen(100 * seed + k).scalar()
        sources.append(
            f"filter f{k} (image in, float p: 0-2 (1)) "
            f"grayColor(clamp(({body}) * 0.3 + p * 0.2, 0, 1)) end")
    jobs = [(sources[rng.randint(4)], _img(int(rng.randint(50))),
             float(rng.rand()), {"p": float(rng.uniform(0, 2))})
            for _ in range(12)]
    results = [None] * len(jobs)

    def go(i):
        src, img, t, ps = jobs[i]
        results[i] = service.render_sync({"source": src}, [img], W, H,
                                         t=t, params=ps)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(len(jobs))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for i, (src, img, t, ps) in enumerate(jobs):
        direct = mm.compile(src).render(img, width=W, height=H, t=t, params=ps)
        _match_u8(results[i], direct)


def test_mixed_dtype_jobs_never_group(service):
    """A uint8 and a float32 job with the same geometry must not share a
    batch: np.stack would promote the u8 frames to 0-255 floats, which
    skip the in-trace /255 normalization (review r3, reproduced as an
    all-white u8 render)."""
    f32 = _img(11)
    u8 = (np.clip(f32, 0, 1) * 255 + 0.5).astype(np.uint8)
    src = {"source": "filter f (image in) in(xy) end"}
    jobs = [service.submit(src, [u8], W, H),
            service.submit(src, [f32], W, H)]
    assert jobs[0].sig != jobs[1].sig
    for j in jobs:
        assert j.done.wait(120)
        assert j.error is None, j.error
    # both render the same picture (u8 input normalizes in-trace)
    a, b = (np.asarray(j.result) for j in jobs)
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_http_supersample_scheme_honored(http_server):
    """supersample_scheme must reach RenderOptions (it was silently
    dropped); corners vs grid place AA samples differently, so a
    gradient filter's outputs must differ."""
    src = {"source": "filter f () grayColor(x * x / (W * W) * 4) end"}
    outs = {}
    for scheme in ("grid", "corners"):
        code, body = _post(http_server, "/render", {
            "filter": src, "width": W, "height": H, "format": "raw",
            "supersample": 2, "supersample_scheme": scheme})
        assert code == 200, body
        outs[scheme] = np.frombuffer(
            base64.b64decode(body["data"]), np.uint8)
    assert not np.array_equal(outs["grid"], outs["corners"])


def test_http_edge_color_option_forwarded(http_server):
    """edge_color arrives as a JSON array — it must tuple-ify into the
    frozen RenderOptions and reach the render."""
    src = {"source": "filter f (image in) in(xy + xy:[50, 0]) end"}
    img = _png_b64(_img(3))
    outs = {}
    for col in ([0, 0, 0, 1], [1, 0, 0, 1]):
        code, body = _post(http_server, "/render", {
            "filter": src, "width": W, "height": H, "format": "raw",
            "inputs": [img], "edge_color": col})
        assert code == 200, body
        outs[str(col)] = np.frombuffer(
            base64.b64decode(body["data"]), np.uint8)
    assert not np.array_equal(*outs.values())


# -- binary responses + artifact serving (review r3 additions) ---------

def _post_bytes(base, path, obj):
    """POST returning (status, raw bytes, headers)."""
    req = urllib.request.Request(
        base + path, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def test_http_binary_png_and_raw_match_json(http_server):
    """binary:true returns the same bytes the base64-in-JSON form wraps,
    with the right content types (and X-Shape/X-Dtype for raw)."""
    src = {"source": "filter f () grayColor(x / W + 0.5) end"}
    base_req = {"filter": src, "width": W, "height": H}
    _, body = _post(http_server, "/render", {**base_req, "png_level": 1})
    code, data, hdr = _post_bytes(
        http_server, "/render", {**base_req, "png_level": 1, "binary": True})
    assert code == 200 and hdr["Content-Type"] == "image/png"
    assert data == base64.b64decode(body["image"])
    _, body = _post(http_server, "/render", {**base_req, "format": "raw"})
    code, data, hdr = _post_bytes(
        http_server, "/render", {**base_req, "format": "raw", "binary": True})
    assert code == 200
    assert hdr["Content-Type"] == "application/octet-stream"
    assert hdr["X-Shape"] == f"{H},{W},4" and hdr["X-Dtype"] == "uint8"
    assert data == base64.b64decode(body["data"])


def test_http_binary_gif(http_server):
    code, data, hdr = _post_bytes(http_server, "/animate", {
        "filter": {"source": "filter f () grayColor(t) end"},
        "width": W, "height": H, "num_frames": 2, "binary": True})
    assert code == 200 and hdr["Content-Type"] == "image/gif"
    assert data[:6] in (b"GIF87a", b"GIF89a")


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    from mathmap_tpu.generators.artifact import export_artifact

    d = tmp_path_factory.mktemp("artifacts")
    f = mm.compile(
        "filter tinted (image in, float gain: 0-2 (1)) in(xy) * gain end")
    export_artifact(f, str(d / "tinted.mmxa"), W, H,
                    params={"gain": 1.0})
    return d


def test_artifact_serving_http(artifact_dir, service, http_server):
    names = service.load_artifacts(str(artifact_dir))
    assert names == ["tinted"]
    code, body = _get(http_server, "/artifacts")
    assert code == 200 and body["tinted"]["n_inputs"] == 1
    img = _img(7)
    code, body = _post(http_server, "/render", {
        "artifact": "tinted", "inputs": [_png_b64(img)],
        "params": {"gain": 0.5}, "format": "raw"})
    assert code == 200, body
    out = np.frombuffer(base64.b64decode(body["data"]),
                        np.dtype(body["dtype"])).reshape(body["shape"])
    # the artifact renders float32 (no service output_dtype repack) and
    # the PNG round-trip quantized the input to u8 -> compare loosely
    expect = np.asarray(Image_open_rgba(_png_b64(img))) / 255.0 * 0.5
    assert np.abs(out[..., :3] - expect[..., :3]).max() < 2 / 255
    code, body = _post(http_server, "/render", {
        "artifact": "nope", "inputs": [_png_b64(img)]})
    assert code == 400 and "unknown artifact" in body["error"]


def Image_open_rgba(b64):
    from PIL import Image

    im = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGBA")
    return np.asarray(im)


def test_artifact_u8_input_normalizes(artifact_dir):
    """uint8 inputs to a loaded artifact must normalize /255 like every
    other render entry point (review r3: a bare float cast fed 0-255)."""
    from mathmap_tpu.generators.artifact import load_artifact

    art = load_artifact(str(artifact_dir / "tinted.mmxa"))
    f32 = _img(9)
    u8 = (f32 * 255).round().astype(np.uint8)
    a = art.render(u8.astype(np.float32) / 255.0, params={"gain": 1.0})
    b = art.render(u8, params={"gain": 1.0})
    np.testing.assert_array_equal(a, b)


def test_artifact_requests_microbatch(tmp_path_factory):
    """Concurrent requests for a batch-exported artifact coalesce into
    one exported-batch-program dispatch (and match lone renders)."""
    from mathmap_tpu.generators.artifact import export_artifact, load_artifact

    d = tmp_path_factory.mktemp("arts_batched")
    f = mm.compile(
        "filter sc (image in, float gain: 0-2 (1)) in(xy) * gain end")
    export_artifact(f, str(d / "sc.mmxa"), W, H, params={"gain": 1.0},
                    batch_sizes=(4,))
    svc = RenderService(max_batch=8, window_ms=60.0)
    try:
        svc.load_artifacts(str(d))
        art = load_artifact(str(d / "sc.mmxa"))
        imgs = [_img(i) for i in range(4)]
        results = [None] * 4

        def go(i):
            results[i] = svc.render_artifact(
                "sc", [imgs[i]], params={"gain": 0.25 * (i + 1)})

        ths = [threading.Thread(target=go, args=(i,)) for i in range(4)]
        for th in ths:
            th.start()
        for th in ths:
            th.join(120)
        snap = svc.snapshot()
        assert snap["jobs"] == 4
        assert snap["batch_hist"].get("4") == 1, snap  # ONE dispatch
        for i in range(4):
            want = art.render(imgs[i], params={"gain": 0.25 * (i + 1)})
            np.testing.assert_array_equal(results[i], want)
    finally:
        svc.shutdown()


def test_artifact_without_batch_programs_singletons(tmp_path_factory):
    """Artifacts exported without batch_sizes dispatch per-request (no
    window wait, unique sigs) and still serve correct results."""
    from mathmap_tpu.generators.artifact import export_artifact

    d = tmp_path_factory.mktemp("arts_single")
    f = mm.compile("filter g () grayColor(x / W + 0.5) end")
    export_artifact(f, str(d / "g.mmxa"), W, H)
    svc = RenderService(max_batch=8, window_ms=60.0)
    try:
        svc.load_artifacts(str(d))
        outs = [svc.render_artifact("g", []) for _ in range(2)]
        snap = svc.snapshot()
        assert snap["dispatches"] == 2  # never grouped
        np.testing.assert_array_equal(outs[0], outs[1])
        assert outs[0].shape == (H, W, 4)
    finally:
        svc.shutdown()


def test_artifact_animate_http(tmp_path_factory):
    """/animate with {"artifact": name} runs the exported whole-sweep
    program and returns a GIF (or raw frames)."""
    from mathmap_tpu.generators.artifact import export_artifact

    d = tmp_path_factory.mktemp("arts_anim")
    f = mm.compile("filter g () grayColor(t) end")
    export_artifact(f, str(d / "g.mmxa"), W, H, anim_frames=3)
    svc = RenderService(max_batch=8, window_ms=30.0)
    try:
        svc.load_artifacts(str(d))
        from http.server import ThreadingHTTPServer

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            code, body = _post(base, "/animate", {
                "artifact": "g", "format": "raw"})
            assert code == 200, body
            arr = np.frombuffer(base64.b64decode(body["data"]),
                                np.dtype(body["dtype"])
                                ).reshape(body["shape"])
            assert arr.shape == (3, H, W, 4)
            # t sweeps 0 -> 2/3 (periodic default): frames brighten
            assert arr[0, 0, 0, 0] < arr[2, 0, 0, 0]
            code, data, hdr = _post_bytes(base, "/animate", {
                "artifact": "g", "binary": True})
            assert code == 200 and hdr["Content-Type"] == "image/gif"
            assert data[:6] in (b"GIF87a", b"GIF89a")
            # conflicting num_frames -> 400 (F is fixed at export)
            code, body = _post(base, "/animate", {
                "artifact": "g", "num_frames": 8})
            assert code == 400 and "re-export" in body["error"]
            code, body = _post(base, "/animate", {
                "artifact": "g", "num_frames": 3, "format": "raw"})
            assert code == 200, body  # matching num_frames is fine
            # the single-frame program still serves /render
            code, body = _post(base, "/render", {"artifact": "g"})
            assert code == 200, body
        finally:
            httpd.shutdown()
    finally:
        svc.shutdown()


def test_artifact_bad_request_cannot_poison_batch(tmp_path_factory):
    """Requests are validated against the manifest BEFORE enqueueing:
    a malformed request (wrong shape / missing inputs / bad params)
    raises its own 400 and never joins — or fails — a batch group."""
    from mathmap_tpu.generators.artifact import export_artifact

    d = tmp_path_factory.mktemp("arts_poison")
    f = mm.compile(
        "filter sc (image in, float gain: 0-2 (1)) in(xy) * gain end")
    export_artifact(f, str(d / "sc.mmxa"), W, H, params={"gain": 1.0},
                    batch_sizes=(2,))
    svc = RenderService(max_batch=8, window_ms=40.0)
    try:
        svc.load_artifacts(str(d))
        good = [None]
        bad_errors = []

        def good_client():
            good[0] = svc.render_artifact(
                "sc", [_img(0)], params={"gain": 1.0})

        def bad_client(inputs, params):
            try:
                svc.render_artifact("sc", inputs, params=params)
            except ValueError as e:
                bad_errors.append(str(e))

        ths = [threading.Thread(target=good_client),
               threading.Thread(target=bad_client,
                                args=([np.zeros((4, 4, 4), np.float32)],
                                      {"gain": 1.0})),
               threading.Thread(target=bad_client, args=([], {"gain": 1.0})),
               threading.Thread(target=bad_client,
                                args=([_img(1)], {"nope": 2.0}))]
        for th in ths:
            th.start()
        for th in ths:
            th.join(120)
        assert len(bad_errors) == 3, bad_errors
        assert good[0] is not None and good[0].shape == (H, W, 4)
        # the malformed requests never became jobs
        assert svc.snapshot()["jobs"] == 1
    finally:
        svc.shutdown()


def test_artifact_name_collision_and_reload(tmp_path_factory):
    """Reloading the same file replaces in place; a DIFFERENT file
    claiming a taken name (and stem) raises instead of silently
    rerouting clients."""
    from mathmap_tpu.generators.artifact import export_artifact

    d1 = tmp_path_factory.mktemp("arts_c1")
    d2 = tmp_path_factory.mktemp("arts_c2")
    f = mm.compile("filter g () grayColor(x / W + 0.5) end")
    export_artifact(f, str(d1 / "g.mmxa"), W, H)
    export_artifact(f, str(d2 / "g.mmxa"), W, H)
    svc = RenderService(max_batch=4, window_ms=10.0)
    try:
        assert svc.load_artifacts(str(d1)) == ["g"]
        assert svc.load_artifacts(str(d1)) == ["g"]  # same-path reload ok
        with pytest.raises(ValueError, match="already serves"):
            svc.load_artifacts(str(d2))
    finally:
        svc.shutdown()


def test_export_anim_frames_zero_rejected(tmp_path_factory):
    from mathmap_tpu.generators.artifact import export_artifact

    f = mm.compile("filter g () grayColor(t) end")
    d = tmp_path_factory.mktemp("arts_zero")
    with pytest.raises(ValueError, match="anim_frames must be >= 1"):
        export_artifact(f, str(d / "z.mmxa"), W, H, anim_frames=0)


def test_http_render_region(http_server):
    """A 'region' option renders the selection crop: region-sized output,
    equal to the full render's crop (u8: the lone-vs-batched float paths
    can flip an 8-bit rounding boundary, so <=1 count)."""
    from PIL import Image

    img = _img(9)
    base = {"filter": "twirl", "width": W, "height": H, "t": 0.2,
            "params": {"angle": 3.0}, "inputs": [_png_b64(img)]}
    code, full = _post(http_server, "/render", base)
    code_r, reg = _post(http_server, "/render",
                        {**base, "region": [4, 6, 16, 12]})
    assert code == 200 and code_r == 200, (full, reg)
    fa = np.asarray(Image.open(io.BytesIO(base64.b64decode(full["image"]))))
    ra = np.asarray(Image.open(io.BytesIO(base64.b64decode(reg["image"]))))
    assert ra.shape == (12, 16, 4)
    diff = np.abs(ra.astype(np.int16) - fa[6:18, 4:20].astype(np.int16))
    assert diff.max() <= 1

    # out-of-canvas region is a 400 client error, not a traceback
    code_e, body = _post(http_server, "/render",
                         {**base, "region": [W - 2, 0, 8, 8]})
    assert code_e == 400 and "exceeds" in body["error"]
