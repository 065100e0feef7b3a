/* OpenWebRX-TPU browser receiver.
 * Speaks the OpenWebRX wire protocol: "SERVER DE CLIENT" handshake, typed
 * JSON down-messages, binary 0x01 FFT / 0x02 ADPCM audio frames.
 */
"use strict";

/* ------------------------------------------------ IMA ADPCM decoder --- */
const IMA_INDEX = [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8];
const IMA_STEP = [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
  50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,
  337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,
  1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
  6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,
  22385,24623,27086,29794,32767];

class AdpcmCodec {
  constructor() { this.reset(); }
  reset() { this.pred = 0; this.idx = 0; }
  nibble(n) {
    const step = IMA_STEP[this.idx];
    let diff = step >> 3;
    if (n & 1) diff += step >> 2;
    if (n & 2) diff += step >> 1;
    if (n & 4) diff += step;
    if (n & 8) diff = -diff;
    this.pred = Math.max(-32768, Math.min(32767, this.pred + diff));
    this.idx = Math.max(0, Math.min(88, this.idx + IMA_INDEX[n]));
    return this.pred;
  }
  decode(bytes) {
    const out = new Int16Array(bytes.length * 2);
    for (let i = 0; i < bytes.length; i++) {
      out[2*i] = this.nibble(bytes[i] & 0x0f);
      out[2*i+1] = this.nibble(bytes[i] >> 4);
    }
    return out;
  }
}

/* Streaming audio decoder with SYNC-frame resynchronisation. */
class SyncAudioDecoder {
  constructor() { this.codec = new AdpcmCodec(); this.phase = 0;
                  this.matched = 0; this.syncBuf = []; this.counter = 0; }
  decode(bytes) {
    const out = [];
    for (const b of bytes) {
      if (this.phase === 0) {
        this.matched = (b === "SYNC".charCodeAt(this.matched)) ? this.matched+1 : 0;
        if (this.matched === 4) { this.syncBuf = []; this.phase = 1; this.matched = 0; }
      } else if (this.phase === 1) {
        this.syncBuf.push(b);
        if (this.syncBuf.length === 4) {
          const dv = new DataView(new Uint8Array(this.syncBuf).buffer);
          this.codec.idx = dv.getInt16(0, true);
          this.codec.pred = dv.getInt16(2, true);
          this.counter = 1000; this.phase = 2;
        }
      } else {
        out.push(this.codec.nibble(b & 0x0f), this.codec.nibble(b >> 4));
        if (this.counter-- === 0) this.phase = 0;
      }
    }
    return Int16Array.from(out);
  }
}

/* ------------------------------------------------------- audio engine --- */
class AudioEngine {
  constructor() {
    this.ctx = null; this.rate = 12000; this.buffer = new Float32Array(0);
    this.decoder = new SyncAudioDecoder(); this.volume = 0.7; this.started = false;
  }
  start() {
    if (this.started) return;
    this.ctx = new (window.AudioContext || window.webkitAudioContext)();
    const node = this.ctx.createScriptProcessor(4096, 0, 1);
    node.onaudioprocess = (e) => this.pull(e.outputBuffer.getChannelData(0));
    node.connect(this.ctx.destination);
    this.node = node; this.started = true;
  }
  push(bytes, rate) {
    if (!this.started) return;
    if (rate && rate !== this.rate) {        // e.g. WFM HD switches to 48 kHz
      this.rate = rate;
      this.decoder = new SyncAudioDecoder();
      this.buffer = new Float32Array(0);
    }
    const pcm = this.decoder.decode(bytes);
    const ratio = this.ctx.sampleRate / this.rate;
    const n = Math.floor(pcm.length * ratio);
    const res = new Float32Array(n);
    for (let i = 0; i < n; i++) {
      const pos = i / ratio;
      const i0 = Math.floor(pos), frac = pos - i0;
      const a = pcm[Math.min(i0, pcm.length-1)] / 32768;
      const b = pcm[Math.min(i0+1, pcm.length-1)] / 32768;
      res[i] = (a + (b - a) * frac) * this.volume;
    }
    const merged = new Float32Array(this.buffer.length + res.length);
    merged.set(this.buffer); merged.set(res, this.buffer.length);
    /* cap buffered audio at ~1s to bound latency */
    this.buffer = merged.length > this.ctx.sampleRate ?
      merged.subarray(merged.length - this.ctx.sampleRate) : merged;
  }
  pull(out) {
    const n = Math.min(out.length, this.buffer.length);
    out.set(this.buffer.subarray(0, n));
    out.fill(0, n);
    this.buffer = this.buffer.subarray(n);
  }
}

/* ---------------------------------------------------------- waterfall --- */
class Waterfall {
  constructor(canvas, scaleCanvas) {
    this.canvas = canvas; this.ctx = canvas.getContext("2d");
    this.scale = scaleCanvas; this.sctx = scaleCanvas.getContext("2d");
    this.fftSize = 4096; this.min = -88; this.max = -20;
    this.zoom = 1; this.center = 0.5;  // view center in [0,1] of full span
    this.colormap = this.buildColormap();
    this.resize();
    window.addEventListener("resize", () => this.resize());
  }
  resize() {
    this.canvas.width = this.canvas.clientWidth;
    this.canvas.height = this.canvas.clientHeight;
    this.scale.width = this.scale.clientWidth;
    this.img = this.ctx.createImageData(this.canvas.width, 1);
  }
  buildColormap() {
    /* simple turbo-like gradient */
    const stops = [[48,18,59],[62,120,222],[34,205,190],[134,240,80],
                   [249,213,51],[244,105,34],[122,4,3]];
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
  addRow(row) {
    const w = this.canvas.width;
    /* scroll down by 1px */
    this.ctx.drawImage(this.canvas, 0, 0, w, this.canvas.height - 1,
                       0, 1, w, this.canvas.height - 1);
    const [lo, hi] = this.viewRange();
    const data = this.img.data;
    for (let x = 0; x < w; x++) {
      const bin = Math.floor((lo + (hi - lo) * x / w) * row.length);
      const v = row[Math.max(0, Math.min(row.length - 1, bin))];
      let t = Math.round((v - this.min) / (this.max - this.min) * 255);
      t = Math.max(0, Math.min(255, t));
      data[x*4] = this.colormap[t*3];
      data[x*4+1] = this.colormap[t*3+1];
      data[x*4+2] = this.colormap[t*3+2];
      data[x*4+3] = 255;
    }
    this.ctx.putImageData(this.img, 0, 0);
  }
  /* auto level from percentiles of the latest row */
  autoLevel(row) {
    const sorted = Float32Array.from(row).sort();
    this.min = sorted[Math.floor(sorted.length * 0.2)] - 5;
    this.max = sorted[sorted.length - 1] + 15;
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

/* ------------------------------------------------------------ spectrum --- */
/* Live spectrum line graph over the same FFT rows (reference
 * lib/Spectrum.js): exponential averaging, filled trace. */
class Spectrum {
  constructor(canvas) {
    this.canvas = canvas; this.ctx = canvas.getContext("2d");
    this.avg = null; this.alpha = 0.5; this.enabled = false;
  }
  toggle() {
    this.enabled = !this.enabled;
    this.canvas.style.display = this.enabled ? "block" : "none";
    if (this.enabled) {
      this.canvas.width = this.canvas.clientWidth;
      this.canvas.height = this.canvas.clientHeight;
    }
    return this.enabled;
  }
  update(row, view, min, max) {
    if (!this.enabled) return;
    if (this.avg === null || this.avg.length !== row.length)
      this.avg = Float32Array.from(row);
    for (let i = 0; i < row.length; i++)
      this.avg[i] += (row[i] - this.avg[i]) * this.alpha;
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;
    const [lo, hi] = view;
    ctx.fillStyle = "#0a0d10"; ctx.fillRect(0, 0, w, h);
    ctx.beginPath();
    for (let x = 0; x < w; x++) {
      const bin = Math.floor((lo + (hi - lo) * x / w) * row.length);
      const v = this.avg[Math.max(0, Math.min(row.length - 1, bin))];
      const y = h - (v - min) / (max - min) * h;
      if (x === 0) ctx.moveTo(x, y); else ctx.lineTo(x, y);
    }
    ctx.strokeStyle = "#3fa9f5"; ctx.lineWidth = 1; ctx.stroke();
    ctx.lineTo(w, h); ctx.lineTo(0, h); ctx.closePath();
    ctx.fillStyle = "rgba(63,169,245,.15)"; ctx.fill();
  }
}

/* ------------------------------------------------------------- scanner --- */
/* Client-side bookmark scanner (reference lib/Scanner.js:1-110): averages
 * FFT bins at each scannable bookmark's offset and tunes to the first one
 * whose level rises above squelch − 13 dB; resumes when it drops. */
class Scanner {
  constructor() { this.enabled = false; this.levels = {}; this.current = null;
                  this.dwellUntil = 0; }
  toggle() { this.enabled = !this.enabled; this.current = null;
             return this.enabled; }
  threshold() {
    const sq = parseFloat(document.getElementById("squelch").value);
    return (sq > -150 ? sq : -80) - 13;
  }
  update(row) {
    if (!this.enabled || !app.bookmarks.length) return;
    const sr = app.config.samp_rate, cf = app.config.center_freq;
    if (!sr) return;
    const now = Date.now();
    const th = this.threshold();
    for (const b of app.bookmarks) {
      const frac = (b.frequency - cf) / sr + 0.5;
      if (frac < 0 || frac > 1) continue;
      const bin = Math.floor(frac * row.length);
      const v = row[Math.max(0, Math.min(row.length - 1, bin))];
      const key = b.frequency;
      this.levels[key] = (this.levels[key] === undefined) ? v :
        this.levels[key] * 0.7 + v * 0.3;
      if (this.current === null && this.levels[key] > th) {
        this.current = key;
        this.dwellUntil = now + 2000;
        if (b.modulation) setMode(b.modulation);
        tune(b.frequency - cf);
        log(`scanner: ${(b.frequency / 1e6).toFixed(4)} MHz (${b.name})`);
      }
    }
    if (this.current !== null && now > this.dwellUntil &&
        this.levels[this.current] <= th) {
      this.current = null;             // signal gone: resume scanning
    }
  }
}

/* -------------------------------------------------------------- app ----- */
const app = {
  ws: null, config: {}, modes: [], mode: "nfm", offset: 0,
  bookmarks: [], dials: [],
  audio: new AudioEngine(), rxName: document.getElementById("receiver-name"),
  waterfall: new Waterfall(document.getElementById("waterfall"),
                           document.getElementById("scale")),
  fftCodec: new AdpcmCodec(), autoLeveled: 0, dspStarted: false,
  spectrum: new Spectrum(document.getElementById("spectrum")),
  scanner: new Scanner(),
};
app.secondaryWf = new SecondaryWaterfall(document.getElementById("secondary-wf"));
app.imagePanel = new ImagePanel(document.getElementById("digi-image"));
if (window.Plugins) Plugins.attach(app);

function log(msg) {
  const el = document.getElementById("log");
  el.textContent += msg + "\n";
  el.scrollTop = el.scrollHeight;
}

function connect() {
  const proto = location.protocol === "https:" ? "wss" : "ws";
  const ws = new WebSocket(`${proto}://${location.host}/ws/`);
  ws.binaryType = "arraybuffer";
  app.ws = ws;
  ws.onopen = () => {};
  ws.onclose = () => { log("disconnected, retrying in 3s"); setTimeout(connect, 3000); };
  ws.onmessage = onMessage;
}

function send(obj) { if (app.ws && app.ws.readyState === 1) app.ws.send(JSON.stringify(obj)); }

function onMessage(evt) {
  if (typeof evt.data === "string") {
    if (evt.data.startsWith("CLIENT DE SERVER")) {
      app.ws.send("SERVER DE CLIENT client=openwebrx-tpu.js type=receiver");
      send({type: "dspcontrol", action: "start"});
      return;
    }
    const msg = JSON.parse(evt.data);
    handleJson(msg);
    if (window.Plugins) Plugins.fire("server_message", msg);
    return;
  }
  const data = new Uint8Array(evt.data);
  const type = data[0], payload = data.subarray(1);
  if (type === 1) {
    let row;
    if (app.config.fft_compression === "adpcm") {
      app.fftCodec.reset();
      const i16 = app.fftCodec.decode(payload);
      row = new Float32Array(i16.length - 10);
      for (let i = 0; i < row.length; i++) row[i] = i16[i + 10] / 100;
    } else {
      row = new Float32Array(payload.slice().buffer);
    }
    if (app.autoLeveled++ % 50 === 0) app.waterfall.autoLevel(row);
    app.waterfall.addRow(row);
    app.spectrum.update(row, app.waterfall.viewRange(),
                        app.waterfall.min, app.waterfall.max);
    app.scanner.update(row);
    if (window.Plugins) Plugins.fire("fft", row);
  } else if (type === 2) {
    app.audio.push(payload, 12000);
  } else if (type === 4) {                   // HD (48 kHz) audio for WFM
    app.audio.push(payload, 48000);
  } else if (type === 3) {                   // secondary (digimode) FFT
    app.secondaryWf.addRow(payload);
  }
}

/* secondary waterfall: ADPCM rows like the main FFT (pad 10, /100) */
class SecondaryWaterfall {
  constructor(canvas) {
    this.canvas = canvas; this.ctx = canvas.getContext("2d");
    this.codec = new AdpcmCodec();
  }
  show(on) { this.canvas.style.display = on ? "block" : "none"; }
  addRow(payload) {
    if (this.canvas.style.display === "none") return;
    this.codec.reset();
    const i16 = this.codec.decode(payload);
    const row = new Float32Array(Math.max(0, i16.length - 10));
    for (let i = 0; i < row.length; i++) row[i] = i16[i + 10] / 100;
    const w = this.canvas.width, h = this.canvas.height;
    this.ctx.drawImage(this.canvas, 0, 0, w, h - 1, 0, 1, w, h - 1);
    const img = this.ctx.createImageData(w, 1), cm = app.waterfall.colormap;
    let lo = Infinity, hi = -Infinity;
    for (const v of row) { if (v < lo) lo = v; if (v > hi) hi = v; }
    const span = Math.max(10, hi - lo);
    for (let x = 0; x < w; x++) {
      const v = row[Math.floor(x / w * row.length)] || lo;
      let t = Math.round((v - lo) / span * 255);
      t = Math.max(0, Math.min(255, t));
      img.data[x*4] = cm[t*3]; img.data[x*4+1] = cm[t*3+1];
      img.data[x*4+2] = cm[t*3+2]; img.data[x*4+3] = 255;
    }
    this.ctx.putImageData(img, 0, 0);
  }
}

/* SSTV/FAX image panel: draws base64 pixel rows streamed as JSON lines */
class ImagePanel {
  constructor(canvas) { this.canvas = canvas; this.ctx = canvas.getContext("2d"); }
  show(on) { this.canvas.style.display = on ? "block" : "none"; }
  drawRow(msg) {
    this.show(true);
    const bin = atob(msg.pixels);
    const w = msg.width, grey = bin.length === w;  // fax rows are greyscale
    if (this.canvas.width !== w) { this.canvas.width = w; }
    const y = msg.line % this.canvas.height;
    const img = this.ctx.createImageData(w, 1);
    for (let x = 0; x < w; x++) {
      const o = grey ? x : x * 3;
      img.data[x*4] = bin.charCodeAt(o);
      img.data[x*4+1] = bin.charCodeAt(grey ? o : o + 1);
      img.data[x*4+2] = bin.charCodeAt(grey ? o : o + 2);
      img.data[x*4+3] = 255;
    }
    this.ctx.putImageData(img, 0, y);
  }
}

/* per-mode decode table (reference lib/MessagePanel.js) */
function addMessageRow(ev) {
  const table = document.getElementById("messages");
  table.style.display = "table";
  const body = document.getElementById("messages-body");
  const tr = document.createElement("tr");
  const from = ev.source || ev.address || ev.callsign ||
               (ev.station ? `station ${ev.station}` : "") || ev.flight || "";
  const info = ev.comment || ev.message || ev.text || ev.header ||
               (ev.lat !== undefined ? `${ev.lat.toFixed(4)} ${ev.lon.toFixed(4)}` : "") ||
               (ev.format ? `${ev.format} ${ev.category || ""} ${ev.eos || ""}` : "") ||
               ev.filename || "";
  const utc = new Date().toISOString().slice(11, 19);
  for (const text of [utc, ev.mode || "", from, info]) {
    const td = document.createElement("td");
    td.style.padding = "3px 6px";
    td.textContent = typeof text === "string" ? text : JSON.stringify(text);
    tr.appendChild(td);
  }
  body.appendChild(tr);
  while (body.children.length > 50) body.removeChild(body.firstChild);
  tr.scrollIntoView({block: "nearest"});
}

function handleJson(msg) {
  switch (msg.type) {
    case "receiver_details":
      app.rxName.textContent = `${msg.value.receiver_name || ""} — ${msg.value.receiver_location || ""}`;
      break;
    case "config": {
      Object.assign(app.config, msg.value);
      if (msg.value.start_mod) setMode(msg.value.start_mod, true);
      if (msg.value.start_offset_freq !== undefined) app.offset = msg.value.start_offset_freq;
      updateFreq(); drawScale(); drawBookmarks();
      break;
    }
    case "modes":
      app.modes = msg.value;
      renderModes();
      renderDigimodes();
      break;
    case "profiles": {
      const sel = document.getElementById("profiles");
      sel.innerHTML = "";
      for (const p of msg.value) {
        const o = document.createElement("option");
        o.value = p.id; o.textContent = p.name; sel.appendChild(o);
      }
      break;
    }
    case "smeter": {
      const db = msg.value;
      document.getElementById("smeter-db").textContent = `${db.toFixed(1)} dB`;
      const pct = Math.max(0, Math.min(100, (db + 120) / 120 * 100));
      document.getElementById("smeter").style.width = pct + "%";
      break;
    }
    case "log_message": log(msg.value); break;
    case "secondary_demod": {
      /* JSON event lines route to the image canvas / message table;
       * plain text scrolls in the decoded-text pane */
      let plain = "";
      for (const line of String(msg.value).split("\n")) {
        if (line.startsWith("{")) {
          try {
            const ev = JSON.parse(line);
            if (ev.pixels !== undefined) app.imagePanel.drawRow(ev);
            else addMessageRow(ev);
            continue;
          } catch (e) { /* fall through to text */ }
        }
        if (line) plain += line + "\n";
      }
      if (plain) {
        const el = document.getElementById("decoded");
        el.textContent += plain;
        if (el.textContent.length > 4000)
          el.textContent = el.textContent.slice(-3000);
        el.scrollTop = el.scrollHeight;
      }
      break;
    }
    case "secondary_config":
      app.secondaryWf.show(true);
      break;
    case "clients":
      document.getElementById("clients").textContent = msg.value;
      break;
    case "chat_message": {
      const el = document.getElementById("chat");
      el.textContent += msg.name + ": " + msg.text + "\n";
      el.scrollTop = el.scrollHeight;
      break;
    }
    case "sdr_error": log("SDR error: " + msg.value); break;
    case "demodulator_error": log(msg.value); break;
    case "bookmarks":
      app.bookmarks = msg.value || [];
      drawBookmarks();
      break;
    case "dial_frequencies":
      app.dials = msg.value || [];
      break;
    case "metadata": {
      const el = document.getElementById("decoded");
      const v = msg.value || {};
      const who = v.callsign || (v.additional && v.additional.callsign) ||
                  v.source || v.ourcall || "";
      const parts = [v.protocol, who, v.talkeralias, v.target,
                     v.additional && v.additional.name].filter(Boolean);
      if (parts.length) {
        el.textContent += parts.join(" · ") + "\n";
        el.scrollTop = el.scrollHeight;
      }
      break;
    }
  }
}

/* --------------------------------------------------------- bookmarks ---- */
function drawBookmarks() {
  const bar = document.getElementById("bookmarks");
  bar.innerHTML = "";
  const sr = app.config.samp_rate || 0, cf = app.config.center_freq || 0;
  if (!sr) return;
  const [lo, hi] = app.waterfall.viewRange();
  const w = bar.clientWidth;
  for (const b of app.bookmarks || []) {
    const frac = ((b.frequency - cf) / sr + 0.5 - lo) / (hi - lo);
    if (frac < 0 || frac > 1) continue;
    const el = document.createElement("div");
    el.className = "bookmark";
    el.style.left = (frac * w) + "px";
    el.textContent = b.name;
    el.title = `${(b.frequency / 1e6).toFixed(4)} MHz ${b.modulation}` +
               (b.description ? ` — ${b.description}` : "");
    el.onclick = () => {
      if (b.modulation) setMode(b.modulation);
      tune(b.frequency - cf);
    };
    bar.appendChild(el);
  }
}

/* ------------------------------------------------------------ controls --- */
function renderModes() {
  const el = document.getElementById("modes");
  el.innerHTML = "";
  for (const m of app.modes.filter(m => m.type === "analog" && !m.service)) {
    const b = document.createElement("button");
    b.textContent = m.name; b.dataset.mod = m.modulation;
    if (m.modulation === app.mode) b.classList.add("active");
    b.onclick = () => setMode(m.modulation);
    el.appendChild(b);
  }
}

function setMode(mod, noSend) {
  app.mode = mod;
  for (const b of document.querySelectorAll("#modes button"))
    b.classList.toggle("active", b.dataset.mod === mod);
  const m = app.modes.find(x => x.modulation === mod);
  const params = {mod: mod};
  if (m && m.bandpass) { params.low_cut = m.bandpass.low_cut; params.high_cut = m.bandpass.high_cut; }
  if (!noSend) send({type: "dspcontrol", params});
  drawPassband();
}

function updateFreq() {
  const f = (app.config.center_freq || 0) + app.offset;
  document.getElementById("freq").textContent = (f / 1e6).toFixed(5) + " MHz";
  drawPassband();
}

function tune(offset) {
  const step = parseFloat(app.config.tuning_step || 1);
  if (step > 0) {
    const center = app.config.center_freq || 0;
    offset = Math.round((center + offset) / step) * step - center;
  }
  app.offset = offset;
  send({type: "dspcontrol", params: {offset_freq: offset}});
  updateFreq();
}

function drawScale() {
  app.waterfall.drawScale(app.config.center_freq || 0, app.config.samp_rate || 1);
}

function drawPassband() {
  const pb = document.getElementById("passband");
  const sr = app.config.samp_rate || 1;
  const [lo, hi] = app.waterfall.viewRange();
  const frac = (app.offset / sr + 0.5 - lo) / (hi - lo);
  const m = app.modes.find(x => x.modulation === app.mode);
  const bw = m && m.bandpass ? (m.bandpass.high_cut - m.bandpass.low_cut) : 10000;
  const w = document.getElementById("waterfall").clientWidth;
  pb.style.left = (frac * w - (bw / sr / (hi - lo)) * w / 2) + "px";
  pb.style.width = Math.max(2, (bw / sr / (hi - lo)) * w) + "px";
}

/* click tunes; drag pans the zoomed view (reference waterfall drag) */
(() => {
  const wf = document.getElementById("waterfall");
  let dragStart = null, dragged = false;
  wf.addEventListener("mousedown", (e) => {
    dragStart = {x: e.clientX, center: app.waterfall.center};
    dragged = false;
  });
  window.addEventListener("mousemove", (e) => {
    if (dragStart === null) return;
    const dx = e.clientX - dragStart.x;
    if (Math.abs(dx) > 4) dragged = true;
    if (dragged && app.waterfall.zoom > 1) {
      const span = 1 / app.waterfall.zoom;
      const shift = dx / wf.clientWidth * span;
      app.waterfall.center = Math.max(span / 2, Math.min(1 - span / 2,
        dragStart.center - shift));
      drawScale(); drawPassband(); drawBookmarks();
    }
  });
  window.addEventListener("mouseup", (e) => {
    if (dragStart === null) return;
    const wasDragged = dragged;
    dragStart = null;
    if (wasDragged) return;
    const rect = wf.getBoundingClientRect();
    const x = (e.clientX - rect.left) / rect.width;
    const [lo, hi] = app.waterfall.viewRange();
    const frac = lo + (hi - lo) * x;
    tune((frac - 0.5) * (app.config.samp_rate || 0));
  });
  /* wheel over the waterfall zooms around the pointer */
  wf.addEventListener("wheel", (e) => {
    e.preventDefault();
    const zoomEl = document.getElementById("zoom");
    let level = parseInt(zoomEl.value) + (e.deltaY < 0 ? 1 : -1);
    level = Math.max(0, Math.min(parseInt(zoomEl.max), level));
    zoomEl.value = level;
    const rect = wf.getBoundingClientRect();
    const x = (e.clientX - rect.left) / rect.width;
    const [lo, hi] = app.waterfall.viewRange();
    app.waterfall.zoom = Math.pow(2, level);
    app.waterfall.center = lo + (hi - lo) * x;
    drawScale(); drawPassband(); drawBookmarks();
  });
})();

document.getElementById("squelch").addEventListener("input", (e) => {
  send({type: "dspcontrol", params: {squelch_level: parseFloat(e.target.value)}});
});

document.getElementById("zoom").addEventListener("input", (e) => {
  app.waterfall.zoom = Math.pow(2, parseInt(e.target.value));
  const sr = app.config.samp_rate || 1;
  app.waterfall.center = app.offset / sr + 0.5;
  drawScale(); drawPassband(); drawBookmarks();
});

document.getElementById("volume").addEventListener("input", (e) => {
  app.audio.volume = parseFloat(e.target.value);
});

document.getElementById("mute").addEventListener("click", () => {
  app.audio.start();
  document.getElementById("mute").textContent = "Audio ✓";
});

document.getElementById("profiles").addEventListener("change", (e) => {
  send({type: "selectprofile", params: {profile: e.target.value}});
});

/* digimode list from the server modes registry (reference demodulator
 * panel DIG selector): interactive digimodes ride secondary_mod on their
 * underlying analog mode; listener modes (packet/page/…, underlying
 * "empty") switch mod directly */
function renderDigimodes() {
  const sel = document.getElementById("secondary");
  sel.innerHTML = '<option value="">off</option>';
  for (const m of app.modes.filter(m => m.type === "digimode" && !m.service)) {
    const o = document.createElement("option");
    o.value = m.modulation; o.textContent = m.name;
    sel.appendChild(o);
  }
}

function clearDigiPanels() {
  document.getElementById("decoded").textContent = "";
  document.getElementById("messages-body").innerHTML = "";
  document.getElementById("messages").style.display = "none";
  app.secondaryWf.show(false);
  app.imagePanel.show(false);
}

document.getElementById("secondary").addEventListener("change", (e) => {
  clearDigiPanels();
  const mod = e.target.value;
  if (!mod) { send({type: "dspcontrol", params: {secondary_mod: ""}}); return; }
  const m = app.modes.find(x => x.modulation === mod) || {};
  const underlying = (m.underlying || [])[0];
  if (!underlying || underlying === "empty") {
    send({type: "dspcontrol", params: {mod: mod, offset_freq: app.offset}});
  } else {
    const params = {mod: underlying, secondary_mod: mod,
                    offset_freq: app.offset};
    if (m.bandpass) { params.low_cut = m.bandpass.low_cut;
                      params.high_cut = m.bandpass.high_cut; }
    send({type: "dspcontrol", params});
  }
});

document.getElementById("chat-input").addEventListener("keydown", (e) => {
  if (e.key === "Enter" && e.target.value.trim()) {
    send({type: "sendmessage", text: e.target.value.trim(),
          name: "web user"});
    e.target.value = "";
  }
});

document.getElementById("freq").addEventListener("wheel", (e) => {
  e.preventDefault();
  const step = parseFloat(app.config.tuning_step || 1000);
  tune(app.offset + (e.deltaY < 0 ? step : -step));
});

/* click the readout to type a frequency (MHz) */
document.getElementById("freq").addEventListener("click", () => {
  const cur = ((app.config.center_freq || 0) + app.offset) / 1e6;
  const entry = prompt("Frequency (MHz):", cur.toFixed(5));
  if (entry === null) return;
  const f = parseFloat(entry) * 1e6;
  if (isFinite(f)) tune(f - (app.config.center_freq || 0));
});

document.getElementById("spectrum-toggle").addEventListener("click", (e) => {
  e.target.classList.toggle("active", app.spectrum.toggle());
});

document.getElementById("scanner-toggle").addEventListener("click", (e) => {
  const on = app.scanner.toggle();
  e.target.classList.toggle("active", on);
  log(on ? "scanner started" : "scanner stopped");
});

/* keyboard shortcuts (reference lib/shortcuts) */
window.addEventListener("keydown", (e) => {
  if (e.target.tagName === "INPUT" || e.target.tagName === "SELECT") return;
  const step = parseFloat(app.config.tuning_step || 1000);
  const zoomEl = document.getElementById("zoom");
  switch (e.key) {
    case "ArrowLeft": tune(app.offset - step); e.preventDefault(); break;
    case "ArrowRight": tune(app.offset + step); e.preventDefault(); break;
    case "z": zoomEl.value = Math.min(+zoomEl.max, +zoomEl.value + 1);
      zoomEl.dispatchEvent(new Event("input")); break;
    case "Z": zoomEl.value = Math.max(0, +zoomEl.value - 1);
      zoomEl.dispatchEvent(new Event("input")); break;
    case "s": document.getElementById("spectrum-toggle").click(); break;
    case " ": document.getElementById("mute").click(); e.preventDefault(); break;
  }
});

connect();
