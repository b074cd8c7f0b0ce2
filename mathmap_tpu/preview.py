"""Interactive preview server — the GIMP-plugin dialog analog.

Reference: `mathmap.c` main dialog: expression editor, filter browser,
userval widget panel, preview pane with incremental render (SURVEY.md §2.1
GIMP-plugin row [unverified — mount empty, SURVEY.md §0]). GTK is replaced
by a localhost HTTP app (stdlib only): a browser page with a source editor,
the expression-database tree, auto-generated parameter sliders/color/bool
widgets from the filter signature, and a live-rerendering preview.

    python -m mathmap_tpu.preview [--port 8731] [--input img.png] [--cpu]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>mathmap_tpu preview</title><style>
body { font-family: sans-serif; display: flex; gap: 16px; margin: 16px;
       background: #1e1e24; color: #ddd; }
textarea { width: 100%; height: 240px; font-family: monospace;
           background: #15151a; color: #cde; border: 1px solid #444; }
#left { width: 44%; } #right { flex: 1; }
#preview { max-width: 100%; border: 1px solid #444; image-rendering: pixelated; }
#error { color: #f66; white-space: pre-wrap; font-family: monospace; }
#params label { display: block; margin: 6px 0; }
#library { max-height: 200px; overflow-y: auto; font-size: 13px;
           border: 1px solid #333; padding: 6px; }
#library a { color: #8cf; cursor: pointer; display: block; }
input[type=range] { width: 240px; vertical-align: middle; }
select, button { background: #2a2a33; color: #ddd; border: 1px solid #555; }
</style></head><body>
<div id="left">
  <h3>mathmap_tpu <small style="color:#888">(TPU-native MathMap)</small></h3>
  <textarea id="src"></textarea><br>
  <button onclick="render()">Render (Ctrl-Enter)</button>
  t: <input type="range" id="t" min="0" max="1" step="0.01" value="0"
            oninput="document.getElementById('tv').textContent=this.value; render()">
  <span id="tv">0</span>
  <div id="params"></div>
  <h4>Filter library</h4><div id="library"></div>
  <div id="error"></div>
</div>
<div id="right">
  <img id="preview" width="512">
  <div id="stats" style="color:#888"></div>
</div>
<script>
let paramState = {};
async function render() {
  const src = document.getElementById('src').value;
  const t = parseFloat(document.getElementById('t').value);
  const body = JSON.stringify({source: src, t: t, params: paramState});
  const t0 = performance.now();
  const res = await fetch('/render', {method: 'POST', body: body});
  const data = await res.json();
  const err = document.getElementById('error');
  if (data.error) { err.textContent = data.error; return; }
  err.textContent = '';
  document.getElementById('preview').src = 'data:image/png;base64,' + data.png;
  document.getElementById('stats').textContent =
    data.width + 'x' + data.height + '  ' + (performance.now()-t0).toFixed(0) + ' ms round-trip';
  renderParams(data.params);
}
function renderParams(params) {
  const div = document.getElementById('params');
  div.innerHTML = '';
  for (const p of params) {
    if (p.kind === 'float' || p.kind === 'int') {
      const v = paramState[p.name] !== undefined ? paramState[p.name] : p.value;
      div.insertAdjacentHTML('beforeend',
        `<label>${p.name}: <input type="range" min="${p.lo}" max="${p.hi}"
         step="${p.kind==='int'?1:(p.hi-p.lo)/200}" value="${v}"
         oninput="paramState['${p.name}']=parseFloat(this.value); render()">
         <span>${v}</span></label>`);
    } else if (p.kind === 'color') {
      const v = paramState[p.name] !== undefined ? paramState[p.name] : [0,0,0,1];
      const hex = '#' + v.slice(0,3).map(c => Math.round(c*255).toString(16).padStart(2,'0')).join('');
      div.insertAdjacentHTML('beforeend',
        `<label>${p.name}: <input type="color" value="${hex}"
         oninput="paramState['${p.name}']=[parseInt(this.value.substr(1,2),16)/255,
                  parseInt(this.value.substr(3,2),16)/255,
                  parseInt(this.value.substr(5,2),16)/255, 1]; render()"></label>`);
    } else if (p.kind === 'curve') {
      div.insertAdjacentHTML('beforeend',
        `<label>${p.name} (curve): <select onchange="setCurve('${p.name}', this.value)">
           <option value="identity">identity</option>
           <option value="invert">invert</option>
           <option value="gamma22">gamma 2.2</option>
           <option value="gamma045">gamma 0.45</option>
           <option value="contrast">contrast S</option>
         </select></label>`);
    } else if (p.kind === 'gradient') {
      div.insertAdjacentHTML('beforeend',
        `<label>${p.name} (gradient):
           <input type="color" id="g0_${p.name}" value="#000000"
                  oninput="setGradient('${p.name}')">
           <input type="color" id="g1_${p.name}" value="#ffffff"
                  oninput="setGradient('${p.name}')"></label>`);
    } else if (p.kind === 'bool') {
      const v = paramState[p.name] !== undefined ? paramState[p.name] : p.value;
      div.insertAdjacentHTML('beforeend',
        `<label>${p.name}: <input type="checkbox" ${v?'checked':''}
         onchange="paramState['${p.name}']=this.checked?1:0; render()"></label>`);
    }
  }
}
const CURVES = {
  identity: t => t,
  invert: t => 1 - t,
  gamma22: t => Math.pow(t, 1/2.2),
  gamma045: t => Math.pow(t, 2.2),
  contrast: t => t*t*(3-2*t),
};
function setCurve(name, kind) {
  const fn = CURVES[kind];
  paramState[name] = Array.from({length: 64}, (_, i) => fn(i/63));
  render();
}
function hex2rgb(h) {
  return [parseInt(h.substr(1,2),16)/255, parseInt(h.substr(3,2),16)/255,
          parseInt(h.substr(5,2),16)/255];
}
function setGradient(name) {
  const a = hex2rgb(document.getElementById('g0_' + name).value);
  const b = hex2rgb(document.getElementById('g1_' + name).value);
  paramState[name] = Array.from({length: 32}, (_, i) => {
    const t = i / 31;
    return [a[0]+(b[0]-a[0])*t, a[1]+(b[1]-a[1])*t, a[2]+(b[2]-a[2])*t, 1];
  });
  render();
}
async function loadLibrary() {
  const res = await fetch('/library');
  const lib = await res.json();
  const div = document.getElementById('library');
  for (const cat in lib) {
    div.insertAdjacentHTML('beforeend', `<b>${cat}</b>`);
    for (const name of lib[cat]) {
      div.insertAdjacentHTML('beforeend',
        `<a onclick="loadFilter('${name}')">&nbsp;&nbsp;${name}</a>`);
    }
  }
}
async function loadFilter(name) {
  const res = await fetch('/filter/' + name);
  document.getElementById('src').value = await res.text();
  paramState = {};
  render();
}
document.getElementById('src').addEventListener('keydown', (e) => {
  if (e.key === 'Enter' && e.ctrlKey) render();
});
loadLibrary();
document.getElementById('src').value =
  'filter twirl (image in, float angle: -10-10 (3))\\n' +
  '  in(toXY(ra:[r, a + angle * (1 - r / R) ^ 2]))\\nend';
render();
</script></body></html>
"""


class PreviewState:
    def __init__(self, input_image, size: int, db):
        self.input_image = input_image
        self.size = size
        self.db = db
        self.lock = threading.Lock()  # one render at a time (single chip)
        self._filter_cache = {}

    def render(self, source: str, t: float, params: dict):
        import mathmap_tpu as mm

        with self.lock:
            filt = self._filter_cache.get(source)
            if filt is None:
                filt = mm.compile_source(source)
                filt.filters.update(
                    {k: v for k, v in self.db.library_defs().items()
                     if k not in filt.filters}
                )
                self._filter_cache[source] = filt
            inputs = [self.input_image] if filt.image_params else []
            h = self.size
            w = self.size
            if inputs:
                h, w = inputs[0].shape[:2]
            out = filt.render(*inputs, width=w, height=h, t=t, params=params)
            meta = [
                {
                    "name": p.name, "kind": p.kind,
                    "lo": p.lo if p.lo is not None else 0.0,
                    "hi": p.hi if p.hi is not None else 1.0,
                    "value": params.get(
                        p.name, p.default if p.default is not None else 0.0
                    ),
                }
                for p in filt.params
                if p.kind in ("float", "int", "bool", "color", "curve", "gradient")
            ]
            return out, meta


def _make_handler(state: PreviewState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _PAGE, "text/html")
            elif self.path == "/library":
                lib = {
                    cat: sorted(names)
                    for cat, names in sorted(state.db.categories.items())
                }
                self._send(200, json.dumps(lib))
            elif self.path.startswith("/filter/"):
                name = self.path[len("/filter/"):]
                if name in state.db.entries:
                    self._send(200, state.db.entries[name].source, "text/plain")
                else:
                    self._send(404, "no such filter", "text/plain")
            else:
                self._send(404, "not found", "text/plain")

        def do_POST(self):
            if self.path != "/render":
                self._send(404, "not found", "text/plain")
                return
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            try:
                out, meta = state.render(
                    req["source"], float(req.get("t", 0.0)), req.get("params", {})
                )
                from .imgio.images import to_uint8

                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(to_uint8(np.asarray(out)), "RGBA").save(buf, "PNG")
                self._send(200, json.dumps({
                    "png": base64.b64encode(buf.getvalue()).decode(),
                    "width": out.shape[1], "height": out.shape[0],
                    "params": meta,
                }))
            except Exception as exc:  # surface errors in the page
                msg = exc.format() if hasattr(exc, "format") else traceback.format_exc()
                self._send(200, json.dumps({"error": str(msg)}))

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="mathmap_tpu interactive preview")
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--input", default=None, help="input image for image filters")
    ap.add_argument("--size", type=int, default=256, help="preview size for generative filters")
    ap.add_argument("--cpu", action="store_true", help="render on CPU")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .expression_db import default_db
    from .imgio.images import read_image

    if args.input:
        img = read_image(args.input)
    else:
        # default checker-gradient test card
        h = w = args.size
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [xx / w, yy / h, ((xx // 16 + yy // 16) % 2).astype(np.float32),
             np.ones((h, w))], axis=-1,
        ).astype(np.float32)

    state = PreviewState(img, args.size, default_db())
    server = ThreadingHTTPServer(("127.0.0.1", args.port), _make_handler(state))
    print(f"mathmap_tpu preview on http://127.0.0.1:{args.port}/")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
