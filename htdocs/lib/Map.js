/* Slippy map engine: tiles when online, embedded vector coastline when not.
 *
 * Parity targets from the reference map stack (map-leaflet.js 542 +
 * lib/MapManager.js / MapMarkers.js / MapLocators.js / MapCalls.js /
 * AprsMarker.js / nite-overlay.js, ~2.6 kLoC total, Leaflet/Google based):
 *   - pan/zoom world map (Web Mercator)
 *   - station markers incl. APRS symbol glyphs, aircraft heading arrows
 *   - Maidenhead locator squares
 *   - caller→callee lines
 *   - day/night terminator overlay (solar position math)
 *   - marker popups with age, mode/band filters
 * Implementation is original: a small canvas tile engine instead of
 * Leaflet, with an offline fallback that renders an embedded simplified
 * coastline + graticule, so the map works with zero egress.
 */
"use strict";

const TILE = 256;

/* --- Web Mercator ------------------------------------------------------ */
function lat2y(lat) {
  const s = Math.sin(Math.max(-85.05, Math.min(85.05, lat)) * Math.PI / 180);
  return 0.5 - Math.log((1 + s) / (1 - s)) / (4 * Math.PI);
}
function lon2x(lon) { return (lon + 180) / 360; }
function y2lat(y) {
  return Math.atan(Math.sinh(Math.PI * (1 - 2 * y))) * 180 / Math.PI;
}
function x2lon(x) { return x * 360 - 180; }

/* --- embedded simplified coastline (hand-digitised, very low fidelity;
 *     offline fallback only — online deployments draw raster tiles) ----- */
const COASTLINE = [
  /* North America */
  [[71,-156],[70,-141],[69,-135],[61,-140],[60,-147],[58,-153],[55,-160],
   [52,-172],[55,-162],[58,-157],[59,-152],[60,-145],[59,-137],[57,-133],
   [54,-130],[49,-123],[43,-124],[37,-122],[33,-117],[28,-114],[23,-110],
   [20,-105],[16,-95],[15,-92],[13,-87],[9,-84],[8,-78],[9,-76],[12,-72],
   [11,-64],[16,-62],[18,-67],[20,-73],[23,-80],[25,-80],[28,-80],[33,-79],
   [35,-75],[39,-74],[41,-70],[44,-66],[45,-61],[47,-60],[50,-56],[52,-56],
   [54,-58],[58,-62],[60,-64],[63,-68],[66,-62],[69,-67],[72,-78],[73,-85],
   [70,-85],[66,-87],[64,-90],[59,-94],[57,-92],[55,-82],[52,-79],[55,-77],
   [58,-78],[62,-78],[64,-81],[66,-84],[68,-90],[69,-97],[68,-105],[69,-115],
   [70,-128],[69,-135],[71,-156]],
  /* South America */
  [[12,-72],[10,-62],[8,-60],[5,-52],[0,-50],[-3,-42],[-5,-35],[-8,-35],
   [-13,-38],[-18,-39],[-23,-42],[-25,-48],[-30,-50],[-34,-53],[-38,-57],
   [-41,-62],[-45,-65],[-50,-68],[-54,-68],[-55,-66],[-52,-70],[-47,-73],
   [-42,-73],[-37,-73],[-33,-72],[-27,-71],[-20,-70],[-14,-76],[-6,-81],
   [-3,-80],[1,-79],[4,-77],[8,-77],[9,-76],[8,-78],[12,-72]],
  /* Africa */
  [[37,-6],[35,-2],[37,10],[33,11],[31,20],[32,32],[27,34],[22,37],[15,40],
   [12,43],[11,51],[5,48],[0,42],[-5,39],[-10,40],[-15,40],[-20,35],[-24,35],
   [-26,33],[-29,31],[-34,27],[-35,20],[-33,18],[-29,16],[-23,14],[-18,12],
   [-12,13],[-6,12],[-1,9],[4,9],[4,6],[6,3],[5,-1],[5,-8],[9,-13],[12,-17],
   [15,-17],[20,-17],[25,-15],[28,-13],[31,-10],[35,-6],[37,-6]],
  /* Eurasia */
  [[36,-9],[38,-9],[43,-9],[44,-2],[48,-5],[49,-2],[51,2],[53,5],[54,9],
   [57,8],[55,11],[54,14],[54,20],[57,22],[59,24],[60,28],[63,30],[66,24],
   [66,22],[61,17],[59,18],[56,16],[56,13],[58,11],[59,6],[62,5],[65,12],
   [68,15],[71,26],[70,30],[68,40],[67,45],[69,60],[72,70],[73,80],[76,100],
   [73,113],[71,130],[70,150],[67,170],[66,180],[62,179],[60,170],[61,163],
   [56,162],[53,158],[51,156],[54,142],[50,140],[45,137],[42,132],[39,128],
   [35,129],[38,125],[37,122],[31,122],[27,120],[22,114],[21,108],[18,106],
   [12,109],[9,106],[10,104],[13,100],[8,100],[1,103],[1,104],[7,100],
   [13,98],[16,94],[20,92],[22,91],[21,87],[16,82],[13,80],[9,79],[7,78],
   [9,76],[15,74],[19,73],[21,70],[24,68],[25,62],[25,57],[27,51],[24,52],
   [26,56],[30,49],[29,48],[25,49],[22,39],[15,43],[13,43],[17,40],[22,37],
   [27,34],[31,32],[34,35],[36,36],[37,31],[39,26],[41,26],[40,23],[37,22],
   [38,16],[40,18],[42,15],[46,13],[44,9],[40,15],[38,13],[38,15],[41,17],
   [38,20],[36,-2],[36,-9]],
  /* Australia */
  [[-11,131],[-12,136],[-15,140],[-18,140],[-25,153],[-32,153],[-37,150],
   [-39,146],[-38,141],[-35,138],[-35,136],[-32,134],[-33,124],[-34,115],
   [-31,115],[-26,114],[-22,114],[-18,122],[-14,127],[-11,131]],
  /* Greenland */
  [[60,-43],[62,-42],[65,-40],[68,-32],[70,-28],[73,-22],[76,-18],[79,-20],
   [81,-30],[83,-40],[82,-55],[78,-70],[76,-68],[73,-57],[70,-54],[68,-51],
   [65,-53],[62,-50],[60,-43]],
  /* UK + Ireland (rough) */
  [[50,-5],[51,1],[53,0],[55,-2],[58,-4],[58,-7],[55,-6],[53,-5],[51,-4],
   [50,-5]],
  [[52,-10],[54,-10],[55,-8],[54,-6],[52,-6],[51,-9],[52,-10]],
  /* Japan (rough) */
  [[31,131],[33,131],[34,135],[35,140],[38,141],[41,140],[43,141],[45,142],
   [43,145],[42,143],[40,140],[36,136],[34,133],[31,131]],
  /* New Zealand */
  [[-35,173],[-37,175],[-39,177],[-41,175],[-40,173],[-38,174],[-35,173]],
  [[-41,174],[-43,173],[-46,170],[-46,167],[-44,168],[-42,171],[-41,174]],
  /* Madagascar */
  [[-12,49],[-16,50],[-22,48],[-25,47],[-25,45],[-22,43],[-16,44],[-12,49]],
  /* Borneo/Sumatra/New Guinea rough */
  [[7,117],[1,119],[-3,116],[-4,110],[0,109],[2,109],[5,115],[7,117]],
  [[6,95],[0,100],[-5,105],[-6,106],[-3,102],[2,96],[6,95]],
  [[-1,131],[-3,135],[-6,141],[-8,143],[-10,148],[-10,150],[-8,146],
   [-6,139],[-4,133],[-1,131]],
  /* Antarctica (band) */
  [[-64,-60],[-68,-65],[-72,-75],[-74,-100],[-75,-130],[-77,-160],[-78,170],
   [-72,160],[-68,145],[-67,120],[-66,95],[-68,75],[-70,40],[-70,10],
   [-71,-10],[-73,-40],[-64,-60]],
];

/* --- solar terminator (reference lib/nite-overlay.js behavior) ---------- */
function sunPosition(date) {
  /* low-precision solar ephemeris (NOAA approximation) */
  const rad = Math.PI / 180;
  const ms = date.getTime();
  const jd = ms / 86400000 + 2440587.5;
  const n = jd - 2451545.0;
  const L = (280.460 + 0.9856474 * n) % 360;
  const g = ((357.528 + 0.9856003 * n) % 360) * rad;
  const lambda = (L + 1.915 * Math.sin(g) + 0.020 * Math.sin(2 * g)) * rad;
  const eps = 23.439 * rad;
  const dec = Math.asin(Math.sin(eps) * Math.sin(lambda));
  /* subsolar longitude from GMST */
  const gmst = (18.697374558 + 24.06570982441908 * n) % 24;
  const ra = Math.atan2(Math.cos(eps) * Math.sin(lambda), Math.cos(lambda));
  let lon = (ra / rad - gmst * 15) % 360;
  if (lon > 180) lon -= 360;
  if (lon < -180) lon += 360;
  return {lat: dec / rad, lon};
}

/* --- APRS symbol glyphs (subset of the primary table; reference
 *     lib/AprsMarker.js renders sprite sheets — we draw vector glyphs) -- */
const APRS_GLYPHS = {
  ">": {glyph: "🚗", label: "car"}, "k": {glyph: "🚚", label: "truck"},
  "b": {glyph: "🚲", label: "bike"}, "<": {glyph: "🏍", label: "motorcycle"},
  "-": {glyph: "⌂", label: "house"}, "y": {glyph: "⌂", label: "house+yagi"},
  "_": {glyph: "☂", label: "wx"}, "W": {glyph: "☂", label: "wx"},
  "O": {glyph: "🎈", label: "balloon"}, "'": {glyph: "✈", label: "aircraft"},
  "^": {glyph: "✈", label: "aircraft"}, "s": {glyph: "⛵", label: "ship"},
  "Y": {glyph: "⛵", label: "yacht"}, "r": {glyph: "📡", label: "repeater"},
  "#": {glyph: "✱", label: "digi"}, "&": {glyph: "◇", label: "gateway"},
  "[": {glyph: "🚶", label: "jogger"}, "=": {glyph: "🚆", label: "train"},
  "u": {glyph: "🚛", label: "truck18"}, "j": {glyph: "🚙", label: "jeep"},
};

class SlippyMap {
  constructor(canvas, opts) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.opts = opts || {};
    /* tile URL template; empty string → offline vector mode */
    this.tileUrl = this.opts.tileUrl !== undefined ? this.opts.tileUrl
      : "https://tile.openstreetmap.org/{z}/{x}/{y}.png";
    this.center = {lat: 30, lon: 0};
    this.zoom = 2;
    this.tiles = new Map();                  /* "z/x/y" → Image|"error" */
    this.tilesBroken = 0;
    this.markers = new Map();                /* callsign → record */
    this.calls = [];
    this.filters = {mode: "", band: ""};
    this.nite = true;
    this.onselect = null;
    this.hover = null;
    this._bindEvents();
    this.resize();
    window.addEventListener("resize", () => this.resize());
    setInterval(() => this.draw(), 30000);   /* terminator + age refresh */
  }

  resize() {
    this.canvas.width = this.canvas.clientWidth;
    this.canvas.height = this.canvas.clientHeight || 600;
    this.draw();
  }

  /* world-pixel helpers at current zoom */
  scale() { return TILE * Math.pow(2, this.zoom); }
  toScreen(lat, lon) {
    const s = this.scale();
    const cx = lon2x(this.center.lon) * s, cy = lat2y(this.center.lat) * s;
    return [lon2x(lon) * s - cx + this.canvas.width / 2,
            lat2y(lat) * s - cy + this.canvas.height / 2];
  }
  toLatLon(px, py) {
    const s = this.scale();
    const cx = lon2x(this.center.lon) * s, cy = lat2y(this.center.lat) * s;
    return {lat: y2lat((py - this.canvas.height / 2 + cy) / s),
            lon: x2lon((px - this.canvas.width / 2 + cx) / s)};
  }

  _bindEvents() {
    const c = this.canvas;
    let drag = null;
    c.addEventListener("mousedown", (e) => {
      drag = {x: e.clientX, y: e.clientY, center: {...this.center}, moved: false};
    });
    window.addEventListener("mousemove", (e) => {
      if (!drag) {
        this._hover(e);
        return;
      }
      const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
      if (Math.abs(dx) + Math.abs(dy) > 3) drag.moved = true;
      const s = this.scale();
      this.center = {
        lat: y2lat(lat2y(drag.center.lat) - (-dy) / s),
        lon: x2lon(lon2x(drag.center.lon) - dx / s),
      };
      this.center.lat = Math.max(-80, Math.min(84, this.center.lat));
      this.draw();
    });
    window.addEventListener("mouseup", (e) => {
      if (drag && !drag.moved) this._click(e);
      drag = null;
    });
    c.addEventListener("wheel", (e) => {
      e.preventDefault();
      const rect = c.getBoundingClientRect();
      const before = this.toLatLon(e.clientX - rect.left, e.clientY - rect.top);
      this.zoom = Math.max(1, Math.min(12, this.zoom + (e.deltaY < 0 ? 1 : -1)));
      /* keep the point under the cursor fixed */
      const after = this.toLatLon(e.clientX - rect.left, e.clientY - rect.top);
      this.center.lon += before.lon - after.lon;
      this.center.lat += before.lat - after.lat;
      this.draw();
    });
  }

  _pickMarker(e) {
    const rect = this.canvas.getBoundingClientRect();
    const mx = e.clientX - rect.left, my = e.clientY - rect.top;
    let best = null, bestD = 12 * 12;
    for (const rec of this.markers.values()) {
      if (!this._visible(rec)) continue;
      const [x, y] = this.toScreen(rec.location.lat, rec.location.lon);
      const d = (x - mx) ** 2 + (y - my) ** 2;
      if (d < bestD) { best = rec; bestD = d; }
    }
    return best;
  }
  _hover(e) {
    const m = this._pickMarker(e);
    if (m !== this.hover) {
      this.hover = m;
      this.canvas.style.cursor = m ? "pointer" : "grab";
      this.draw();
    }
  }
  _click(e) {
    const m = this._pickMarker(e);
    if (m && this.onselect) this.onselect(m);
  }

  /* ---- data ---- */
  update(records) {
    for (const rec of records) {
      if (rec.caller !== undefined) {
        this.calls.push(rec);
        if (this.calls.length > 50) this.calls.shift();
      } else if (rec.callsign && rec.location) {
        this.markers.set(rec.callsign, rec);
      }
    }
    this.draw();
  }
  expire(retentionMs) {
    const cutoff = Date.now() - retentionMs;
    for (const [k, v] of this.markers)
      if (v.lastseen < cutoff) this.markers.delete(k);
  }
  _visible(rec) {
    if (this.filters.mode && rec.mode !== this.filters.mode) return false;
    if (this.filters.band && rec.band !== this.filters.band) return false;
    return true;
  }

  /* ---- tiles ---- */
  tile(z, x, y) {
    const n = Math.pow(2, z);
    x = ((x % n) + n) % n;
    if (y < 0 || y >= n) return null;
    const key = `${z}/${x}/${y}`;
    let t = this.tiles.get(key);
    if (t === undefined && this.tileUrl) {
      const img = new Image();
      img.crossOrigin = "anonymous";
      img.onload = () => { this.tiles.set(key, img); this.draw(); };
      img.onerror = () => { this.tiles.set(key, "error"); this.tilesBroken++; };
      img.src = this.tileUrl.replace("{z}", z).replace("{x}", x).replace("{y}", y);
      this.tiles.set(key, "loading");
      t = "loading";
      if (this.tiles.size > 400) {           /* bound the cache */
        for (const k of this.tiles.keys()) {
          if (this.tiles.size <= 300) break;
          this.tiles.delete(k);
        }
      }
    }
    return (t instanceof Image) ? t : null;
  }

  offline() { return !this.tileUrl || this.tilesBroken > 8; }

  /* ---- drawing ---- */
  draw() {
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;
    ctx.fillStyle = "#0d1b2a";
    ctx.fillRect(0, 0, w, h);
    if (!this.offline()) this.drawTiles(ctx, w, h);
    if (this.offline()) this.drawVector(ctx, w, h);
    this.drawGraticule(ctx, w, h);
    if (this.nite) this.drawNite(ctx, w, h);
    this.drawCalls(ctx);
    this.drawMarkers(ctx);
    if (this.hover) this.drawPopup(ctx, this.hover);
  }

  drawTiles(ctx, w, h) {
    const s = this.scale();
    const originX = lon2x(this.center.lon) * s - w / 2;
    const originY = lat2y(this.center.lat) * s - h / 2;
    const x0 = Math.floor(originX / TILE), y0 = Math.floor(originY / TILE);
    const x1 = Math.ceil((originX + w) / TILE), y1 = Math.ceil((originY + h) / TILE);
    for (let ty = y0; ty < y1; ty++) {
      for (let tx = x0; tx < x1; tx++) {
        const img = this.tile(this.zoom, tx, ty);
        if (img)
          ctx.drawImage(img, tx * TILE - originX, ty * TILE - originY);
      }
    }
    /* dim raster tiles slightly for dark UI consistency */
    ctx.fillStyle = "rgba(6,12,20,0.35)";
    ctx.fillRect(0, 0, w, h);
  }

  drawVector(ctx, w, h) {
    ctx.fillStyle = "#12283c";
    ctx.strokeStyle = "#3c5a74";
    ctx.lineWidth = 1;
    for (const poly of COASTLINE) {
      ctx.beginPath();
      for (let i = 0; i < poly.length; i++) {
        const [x, y] = this.toScreen(poly[i][0], poly[i][1]);
        if (i === 0) ctx.moveTo(x, y); else ctx.lineTo(x, y);
      }
      ctx.closePath();
      ctx.fill();
      ctx.stroke();
    }
  }

  drawGraticule(ctx, w, h) {
    ctx.strokeStyle = "rgba(120,150,180,0.15)";
    ctx.fillStyle = "rgba(120,150,180,0.4)";
    ctx.font = "9px sans-serif";
    ctx.lineWidth = 1;
    const step = this.zoom < 3 ? 30 : this.zoom < 5 ? 10 : this.zoom < 8 ? 2 : 0.5;
    const tl = this.toLatLon(0, 0), br = this.toLatLon(w, h);
    for (let lon = Math.ceil(tl.lon / step) * step; lon <= br.lon + 360; lon += step) {
      const [x] = this.toScreen(0, lon);
      if (x < 0 || x > w) continue;
      ctx.beginPath(); ctx.moveTo(x, 0); ctx.lineTo(x, h); ctx.stroke();
      ctx.fillText(`${((lon + 180) % 360 + 360) % 360 - 180}°`, x + 2, h - 4);
    }
    for (let lat = Math.floor(tl.lat / step) * step; lat >= br.lat; lat -= step) {
      const [, y] = this.toScreen(lat, 0);
      if (y < 0 || y > h) continue;
      ctx.beginPath(); ctx.moveTo(0, y); ctx.lineTo(w, y); ctx.stroke();
      ctx.fillText(`${lat}°`, 4, y - 2);
    }
  }

  drawNite(ctx, w, h) {
    const sun = sunPosition(new Date());
    ctx.fillStyle = "rgba(0,0,16,0.35)";
    ctx.beginPath();
    let first = true;
    /* night boundary: points 90° away from the subsolar point */
    const pts = [];
    for (let lon = -180; lon <= 180; lon += 3) {
      const rad = Math.PI / 180;
      const tanLat = -Math.cos((lon - sun.lon) * rad) / Math.tan(sun.lat * rad);
      pts.push([Math.atan(tanLat) / rad, lon]);
    }
    /* close the polygon over the dark pole */
    const darkPoleLat = sun.lat > 0 ? -85 : 85;
    for (const [lat, lon] of pts) {
      const [x, y] = this.toScreen(lat, lon);
      if (first) { ctx.moveTo(x, y); first = false; } else ctx.lineTo(x, y);
    }
    const [xEnd, yPole] = this.toScreen(darkPoleLat, 180);
    const [xStart] = this.toScreen(darkPoleLat, -180);
    ctx.lineTo(xEnd, yPole);
    ctx.lineTo(xStart, yPole);
    ctx.closePath();
    ctx.fill();
  }

  drawCalls(ctx) {
    ctx.strokeStyle = "rgba(255,213,79,0.6)";
    ctx.lineWidth = 1.2;
    for (const c of this.calls) {
      const a = this.markers.get(c.caller), b = this.markers.get(c.callee);
      if (!a || !b) continue;
      const [x1, y1] = this.toScreen(a.location.lat, a.location.lon);
      const [x2, y2] = this.toScreen(b.location.lat, b.location.lon);
      ctx.beginPath();
      /* slight arc via a control point offset perpendicular */
      const mx = (x1 + x2) / 2 - (y2 - y1) * 0.15;
      const my = (y1 + y2) / 2 + (x2 - x1) * 0.15;
      ctx.moveTo(x1, y1);
      ctx.quadraticCurveTo(mx, my, x2, y2);
      ctx.stroke();
    }
  }

  markerColor(rec) {
    const mode = rec.mode || "";
    let hsum = 0;
    for (const ch of mode) hsum = (hsum * 31 + ch.charCodeAt(0)) % 360;
    return `hsl(${hsum}, 70%, 60%)`;
  }

  drawMarkers(ctx) {
    const now = Date.now();
    for (const rec of this.markers.values()) {
      if (!this._visible(rec)) continue;
      const {lat, lon} = rec.location;
      const [x, y] = this.toScreen(lat, lon);
      if (x < -40 || x > this.canvas.width + 40 ||
          y < -40 || y > this.canvas.height + 40) continue;
      const age = (now - rec.lastseen) / 1000;
      const alpha = Math.max(0.35, 1 - age / 7200);
      ctx.globalAlpha = alpha;
      /* locator square for grid-derived positions */
      if (rec.location.type === "locator" && rec.location.locator) {
        const loc = rec.location.locator;
        const lonSz = loc.length >= 6 ? 2 / 24 : 2;
        const latSz = loc.length >= 6 ? 1 / 24 : 1;
        const [x1, y1] = this.toScreen(lat + latSz / 2, lon - lonSz / 2);
        const [x2, y2] = this.toScreen(lat - latSz / 2, lon + lonSz / 2);
        ctx.fillStyle = this.markerColor(rec).replace("60%)", "60%, 0.25)")
                            .replace("hsl", "hsla");
        ctx.strokeStyle = this.markerColor(rec);
        ctx.fillRect(x1, y1, x2 - x1, y2 - y1);
        ctx.strokeRect(x1, y1, x2 - x1, y2 - y1);
      }
      /* glyph: APRS symbol, aircraft arrow, or dot */
      const sym = rec.symbol && APRS_GLYPHS[rec.symbol];
      ctx.fillStyle = this.markerColor(rec);
      if (rec.heading !== undefined) {       /* aircraft/vessel with course */
        ctx.save();
        ctx.translate(x, y);
        ctx.rotate((rec.heading || 0) * Math.PI / 180);
        ctx.beginPath();
        ctx.moveTo(0, -7); ctx.lineTo(5, 7); ctx.lineTo(0, 4);
        ctx.lineTo(-5, 7); ctx.closePath();
        ctx.fill();
        ctx.restore();
      } else if (sym) {
        ctx.font = "13px sans-serif";
        ctx.textAlign = "center";
        ctx.fillText(sym.glyph, x, y + 4);
      } else {
        ctx.beginPath();
        ctx.arc(x, y, 4, 0, 2 * Math.PI);
        ctx.fill();
      }
      /* label at higher zooms */
      if (this.zoom >= 4) {
        ctx.font = "10px sans-serif";
        ctx.textAlign = "left";
        ctx.fillStyle = "#d8dee6";
        ctx.fillText(rec.callsign, x + 7, y + 3);
      }
      ctx.globalAlpha = 1;
    }
  }

  drawPopup(ctx, rec) {
    const [x, y] = this.toScreen(rec.location.lat, rec.location.lon);
    const lines = [
      rec.callsign,
      [rec.mode, rec.band].filter(Boolean).join(" · "),
      `${rec.location.lat.toFixed(3)} ${rec.location.lon.toFixed(3)}` +
        (rec.location.locator ? ` (${rec.location.locator})` : ""),
      `${Math.round((Date.now() - rec.lastseen) / 1000)} s ago` +
        (rec.hops && rec.hops.length ? ` via ${rec.hops.join(",")}` : ""),
    ].filter(Boolean);
    ctx.font = "11px sans-serif";
    const wMax = Math.max(...lines.map(l => ctx.measureText(l).width)) + 16;
    const hBox = lines.length * 14 + 10;
    const bx = Math.min(x + 10, this.canvas.width - wMax - 4);
    const by = Math.max(4, y - hBox - 10);
    ctx.fillStyle = "rgba(20,26,33,0.92)";
    ctx.strokeStyle = "#3fa9f5";
    ctx.beginPath();
    ctx.roundRect(bx, by, wMax, hBox, 4);
    ctx.fill(); ctx.stroke();
    ctx.fillStyle = "#d8dee6";
    ctx.textAlign = "left";
    lines.forEach((l, i) => ctx.fillText(l, bx + 8, by + 16 + i * 14));
  }
}

window.SlippyMap = SlippyMap;
window.APRS_GLYPHS = APRS_GLYPHS;
window.sunPosition = sunPosition;
