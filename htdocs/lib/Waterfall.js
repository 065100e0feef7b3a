/* Waterfall renderer: color themes + level modes + zoom/pan view.
 *
 * Parity targets from the reference htdocs/lib/Waterfall.js (196 LoC,
 * chroma.js based):
 *   - selectable color themes (the reference ships chroma.js scales;
 *     here each theme is a procedural 256-entry gradient — no library)
 *   - level modes: "auto" (percentile measurement with slow tracking,
 *     reference `monitorLevels`), "fixed" (manual min/max), and
 *     "continuous" (per-frame normalisation that keeps adapting)
 * Implementation is original.
 */
"use strict";

const WATERFALL_THEMES = {
  /* classic OpenWebRX gradient (black→blue→cyan→green→yellow→red) */
  default: [[0,0,0],[0,0,255],[0,255,255],[0,255,0],[255,255,0],[255,0,0]],
  /* turbo-like (matplotlib turbo approximation) */
  turbo: [[48,18,59],[62,120,222],[34,205,190],[134,240,80],
          [249,213,51],[244,105,34],[122,4,3]],
  /* teejeez (classic websdr-style palette) */
  teejeez: [[0,0,32],[0,0,112],[0,60,160],[60,160,160],[144,208,80],
            [208,208,0],[255,128,0],[255,0,0],[255,255,255]],
  /* thermal / inferno-like */
  inferno: [[0,0,4],[40,11,84],[101,21,110],[159,42,99],[212,72,66],
            [245,125,21],[250,193,39],[252,255,164]],
  ocean: [[3,5,18],[10,36,74],[22,80,124],[45,135,158],[107,191,183],
          [213,245,227]],
  grayscale: [[0,0,0],[255,255,255]],
};

class Waterfall {
  constructor(canvas, scaleCanvas) {
    this.canvas = canvas; this.ctx = canvas.getContext("2d");
    this.scale = scaleCanvas; this.sctx = scaleCanvas.getContext("2d");
    this.fftSize = 4096; this.min = -88; this.max = -20;
    this.zoom = 1; this.center = 0.5;        /* view center in [0,1] */
    this.theme = "turbo";
    this.levelMode = "auto";                 /* auto | fixed | continuous */
    this.measure = null;                     /* percentile tracker */
    this.colormap = this.buildColormap(this.theme);
    this.resize();
    window.addEventListener("resize", () => this.resize());
  }

  resize() {
    this.canvas.width = this.canvas.clientWidth;
    this.canvas.height = this.canvas.clientHeight;
    this.scale.width = this.scale.clientWidth;
    this.img = this.ctx.createImageData(this.canvas.width, 1);
  }

  setTheme(name) {
    if (!(name in WATERFALL_THEMES)) return;
    this.theme = name;
    this.colormap = this.buildColormap(name);
  }

  setLevelMode(mode) {
    this.levelMode = mode;
    this.measure = null;
  }

  setLevels(min, max) {
    this.min = min; this.max = max;
  }

  buildColormap(name) {
    const stops = WATERFALL_THEMES[name];
    const map = new Uint8ClampedArray(256 * 3);
    for (let i = 0; i < 256; i++) {
      const t = i / 255 * (stops.length - 1);
      const j = Math.min(Math.floor(t), stops.length - 2), f = t - j;
      for (let c = 0; c < 3; c++)
        map[i*3+c] = stops[j][c] + (stops[j+1][c] - stops[j][c]) * f;
    }
    return map;
  }

  viewRange() {
    const span = 1 / this.zoom;
    let lo = this.center - span / 2;
    lo = Math.max(0, Math.min(1 - span, lo));
    return [lo, lo + span];
  }

  /* level measurement: track the 15th percentile (noise floor) and the
   * peak of each row; "auto" converges slowly toward the measurement,
   * "continuous" follows it each frame. */
  monitorLevels(row) {
    if (this.levelMode === "fixed") return;
    const sorted = Float32Array.from(row).sort();
    const floor = sorted[Math.floor(sorted.length * 0.15)];
    const peak = sorted[sorted.length - 1];
    const tgtMin = floor - 5, tgtMax = peak + 15;
    if (this.measure === null) {
      this.measure = {min: tgtMin, max: tgtMax};
      this.min = tgtMin; this.max = tgtMax;
      return;
    }
    const alpha = this.levelMode === "continuous" ? 0.2 : 0.01;
    this.measure.min += (tgtMin - this.measure.min) * alpha;
    this.measure.max += (tgtMax - this.measure.max) * alpha;
    this.min = this.measure.min;
    this.max = this.measure.max;
  }

  addRow(row) {
    this.monitorLevels(row);
    const w = this.canvas.width;
    this.ctx.drawImage(this.canvas, 0, 0, w, this.canvas.height - 1,
                       0, 1, w, this.canvas.height - 1);
    const [lo, hi] = this.viewRange();
    const data = this.img.data;
    const binsPerPx = (hi - lo) * row.length / w;
    for (let x = 0; x < w; x++) {
      const b0 = (lo + (hi - lo) * x / w) * row.length;
      let v;
      if (binsPerPx > 1.5) {                 /* zoomed out: peak-hold per px */
        v = -Infinity;
        const e = Math.min(row.length, Math.ceil(b0 + binsPerPx));
        for (let b = Math.max(0, Math.floor(b0)); b < e; b++)
          if (row[b] > v) v = row[b];
      } else {
        v = row[Math.max(0, Math.min(row.length - 1, Math.floor(b0)))];
      }
      let t = Math.round((v - this.min) / (this.max - this.min) * 255);
      t = Math.max(0, Math.min(255, t));
      data[x*4] = this.colormap[t*3];
      data[x*4+1] = this.colormap[t*3+1];
      data[x*4+2] = this.colormap[t*3+2];
      data[x*4+3] = 255;
    }
    this.ctx.putImageData(this.img, 0, 0);
  }

  drawScale(centerFreq, sampRate) {
    const w = this.scale.width, ctx = this.sctx;
    ctx.fillStyle = "#0c0f12"; ctx.fillRect(0, 0, w, 24);
    ctx.fillStyle = "#8a97a5"; ctx.font = "10px sans-serif";
    ctx.strokeStyle = "#39434d";
    const [lo, hi] = this.viewRange();
    const fLo = centerFreq + (lo - 0.5) * sampRate;
    const fHi = centerFreq + (hi - 0.5) * sampRate;
    const span = fHi - fLo;
    const step = Math.pow(10, Math.floor(Math.log10(span / 8)));
    const first = Math.ceil(fLo / step) * step;
    for (let f = first; f < fHi; f += step) {
      const x = (f - fLo) / span * w;
      ctx.beginPath(); ctx.moveTo(x, 14); ctx.lineTo(x, 24); ctx.stroke();
      ctx.fillText((f / 1e6).toFixed(3), x + 2, 11);
    }
  }
}

/* Live spectrum graph over the same FFT rows (reference lib/Spectrum.js):
 * exponential averaging, filled trace, optional peak-hold line. */
class Spectrum {
  constructor(canvas) {
    this.canvas = canvas; this.ctx = canvas.getContext("2d");
    this.avg = null; this.peak = null; this.alpha = 0.5; this.enabled = false;
    this.peakHold = true;
  }
  toggle() {
    this.enabled = !this.enabled;
    this.canvas.style.display = this.enabled ? "block" : "none";
    if (this.enabled) {
      this.canvas.width = this.canvas.clientWidth;
      this.canvas.height = this.canvas.clientHeight;
      this.avg = this.peak = null;
    }
    return this.enabled;
  }
  update(row, view, min, max) {
    if (!this.enabled) return;
    if (this.avg === null || this.avg.length !== row.length) {
      this.avg = Float32Array.from(row);
      this.peak = Float32Array.from(row);
    }
    for (let i = 0; i < row.length; i++) {
      this.avg[i] += (row[i] - this.avg[i]) * this.alpha;
      this.peak[i] = Math.max(this.peak[i] - 0.1, row[i]);
    }
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;
    const [lo, hi] = view;
    ctx.fillStyle = "#0a0d10"; ctx.fillRect(0, 0, w, h);
    const trace = (arr) => {
      ctx.beginPath();
      for (let x = 0; x < w; x++) {
        const bin = Math.floor((lo + (hi - lo) * x / w) * arr.length);
        const v = arr[Math.max(0, Math.min(arr.length - 1, bin))];
        const y = h - (v - min) / (max - min) * h;
        if (x === 0) ctx.moveTo(x, y); else ctx.lineTo(x, y);
      }
    };
    if (this.peakHold) {
      trace(this.peak);
      ctx.strokeStyle = "rgba(255,213,79,.5)"; ctx.lineWidth = 1; ctx.stroke();
    }
    trace(this.avg);
    ctx.strokeStyle = "#3fa9f5"; ctx.lineWidth = 1; ctx.stroke();
    ctx.lineTo(w, h); ctx.lineTo(0, h); ctx.closePath();
    ctx.fillStyle = "rgba(63,169,245,.15)"; ctx.fill();
  }
}

window.WATERFALL_THEMES = WATERFALL_THEMES;
window.Waterfall = Waterfall;
window.Spectrum = Spectrum;
