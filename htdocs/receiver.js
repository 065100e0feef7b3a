/* OpenWebRX-TPU browser receiver.
 * Speaks the OpenWebRX wire protocol: "SERVER DE CLIENT" handshake, typed
 * JSON down-messages, binary 0x01 FFT / 0x02 ADPCM audio / 0x03 secondary
 * FFT / 0x04 HD audio frames.
 *
 * Components live in lib/: AudioEngine (AudioWorklet + ADPCM),
 * Waterfall (themes + level modes) + Spectrum, MessagePanel (per-mode
 * decode panels), MetaPanel (digital voice / broadcast metadata),
 * Bandplan (ribbon + bookmark dialog), Lookup (callsign/MMSI).
 */
"use strict";

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
    if (!this.enabled || !allBookmarks().length) return;
    const sr = app.config.samp_rate, cf = app.config.center_freq;
    if (!sr) return;
    const now = Date.now();
    const th = this.threshold();
    for (const b of allBookmarks()) {
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

/* -------------------------------------------------------------- app ----- */
const app = {
  ws: null, config: {}, modes: [], mode: "nfm", offset: 0,
  low_cut: -4000, high_cut: 4000,
  bookmarks: [], dials: [], bands: [],
  audio: new AudioEngine(), rxName: document.getElementById("receiver-name"),
  waterfall: new Waterfall(document.getElementById("waterfall"),
                           document.getElementById("scale")),
  fftCodec: new AdpcmCodec(), dspStarted: false,
  spectrum: new Spectrum(document.getElementById("spectrum")),
  scanner: new Scanner(),
  bandplan: new Bandplan(document.getElementById("bandplan")),
  messagePanels: new MessagePanelManager(document.getElementById("message-panels")),
  metaPanels: new MetaPanelManager(document.getElementById("meta-panels")),
};
window.app = app;
app.secondaryWf = new SecondaryWaterfall(document.getElementById("secondary-wf"));
app.imagePanel = new ImagePanel(document.getElementById("digi-image"));
app.bookmarkDialog = new BookmarkDialog(app);
app.bookmarkDialog.onchange = () => drawBookmarks();
app.localBookmarks = new BookmarkLocalStorage();
app.bandplan.attach(() => {
  const sr = app.config.samp_rate || 1, cf = app.config.center_freq || 0;
  const [lo, hi] = app.waterfall.viewRange();
  return [cf + (lo - 0.5) * sr, cf + (hi - 0.5) * sr];
});
if (window.Plugins) Plugins.attach(app);

function allBookmarks() {
  return (app.bookmarks || []).concat(app.localBookmarks.get());
}

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
  app.lastFrame = Date.now();       // connection-quality freshness
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



function handleJson(msg) {
  switch (msg.type) {
    case "receiver_details":
      app.rxName.textContent = `${msg.value.receiver_name || ""} — ${msg.value.receiver_location || ""}`;
      break;
    case "config": {
      Object.assign(app.config, msg.value);
      if (msg.value.start_mod) setMode(msg.value.start_mod, true);
      if (msg.value.start_offset_freq !== undefined) app.offset = msg.value.start_offset_freq;
      if (msg.value.audio_compression) app.audio.compression = msg.value.audio_compression;
      updateFreq(); drawScale(); drawBookmarks(); app.bandplan.draw();
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
    case "cpuusage": {
      const el = document.getElementById("cpu");
      if (el) el.textContent = `cpu ${(msg.value * 100).toFixed(0)}%`;
      break;
    }
    case "log_message": log(msg.value); break;
    case "secondary_demod": {
      /* JSON event lines route to the image canvas / message panels;
       * plain text scrolls in the decoded-text pane */
      let plain = "";
      for (const line of String(msg.value).split("\n")) {
        if (line.startsWith("{")) {
          try {
            const ev = JSON.parse(line);
            if (ev.pixels !== undefined) app.imagePanel.drawRow(ev);
            else app.messagePanels.add(ev);
            continue;
          } catch (e) { /* fall through to text */ }
        }
        if (line) plain += line + "\n";
      }
      if (plain) {
        const el = document.getElementById("decoded");
        el.style.display = "block";
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
    case "bands":
      app.bands = msg.value || [];
      app.bandplan.setBands(app.bands);
      break;
    case "dial_frequencies":
      app.dials = msg.value || [];
      break;
    case "metadata":
      app.metaPanels.update(msg.value || {});
      break;
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
  for (const b of allBookmarks()) {
    const frac = ((b.frequency - cf) / sr + 0.5 - lo) / (hi - lo);
    if (frac < 0 || frac > 1) continue;
    const el = document.createElement("div");
    el.className = "bookmark" + (b.source === "local" ? " local" : "");
    el.style.left = (frac * w) + "px";
    el.textContent = b.name;
    el.title = `${(b.frequency / 1e6).toFixed(4)} MHz ${b.modulation}` +
               (b.description ? ` — ${b.description}` : "") +
               (b.source === "local" ? " (local — shift-click to edit)" : "");
    el.onclick = (e) => {
      if (e.shiftKey && b.source === "local") {
        app.bookmarkDialog.open(b);
        return;
      }
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
  if (m && m.bandpass) {
    app.low_cut = m.bandpass.low_cut; app.high_cut = m.bandpass.high_cut;
    params.low_cut = app.low_cut; params.high_cut = app.high_cut;
  }
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

function redrawOverlays() { drawScale(); drawPassband(); drawBookmarks(); app.bandplan.draw(); }

/* x pixel of a frequency offset (Hz from device center) in the current
   waterfall view */
function offsetToX(offHz) {
  const sr = app.config.samp_rate || 1;
  const [lo, hi] = app.waterfall.viewRange();
  const w = document.getElementById("waterfall").clientWidth;
  return (offHz / sr + 0.5 - lo) / (hi - lo) * w;
}

function xToOffset(x) {
  const sr = app.config.samp_rate || 1;
  const [lo, hi] = app.waterfall.viewRange();
  const w = document.getElementById("waterfall").clientWidth;
  return ((x / w) * (hi - lo) + lo - 0.5) * sr;
}

function drawPassband() {
  const pb = document.getElementById("passband");
  // asymmetric envelope [offset+low_cut, offset+high_cut] with a carrier
  // line at the dial (reference lib/Demodulator.js envelope drawing)
  const x0 = offsetToX(app.offset + app.low_cut);
  const x1 = offsetToX(app.offset + app.high_cut);
  const xc = offsetToX(app.offset);
  pb.style.left = x0 + "px";
  pb.style.width = Math.max(2, x1 - x0) + "px";
  let carrier = pb.querySelector(".carrier");
  if (!carrier) {
    carrier = document.createElement("div");
    carrier.className = "carrier";
    pb.appendChild(carrier);
  }
  carrier.style.left = Math.max(0, Math.min(x1 - x0 - 1, xc - x0 - 1)) + "px";
}

/* draggable passband edges: grab low/high cut on the scale and drag
   (reference htdocs/lib/Demodulator.js:1-463 + DemodulatorPanel.js);
   middle drag moves the whole demodulator */
(() => {
  const pb = document.getElementById("passband");
  const EDGE = 6;            // px hit zone on each edge
  let drag = null;           // {kind: 'low'|'high'|'move', startX, low0, high0, off0}
  let lastSend = 0;

  const sendCuts = (final) => {
    const now = performance.now();
    if (!final && now - lastSend < 150) return;
    lastSend = now;
    const params = {low_cut: Math.round(app.low_cut),
                    high_cut: Math.round(app.high_cut)};
    if (drag && drag.kind === "move") params.offset_freq = Math.round(app.offset);
    send({type: "dspcontrol", params});
  };

  pb.addEventListener("pointermove", (e) => {
    if (drag) return;
    const r = pb.getBoundingClientRect();
    const x = e.clientX - r.left;
    pb.style.cursor = (x <= EDGE || x >= r.width - EDGE) ? "ew-resize" : "move";
  });
  pb.addEventListener("pointerdown", (e) => {
    const r = pb.getBoundingClientRect();
    const x = e.clientX - r.left;
    const kind = x <= EDGE ? "low" : (x >= r.width - EDGE ? "high" : "move");
    drag = {kind, startX: e.clientX, low0: app.low_cut,
            high0: app.high_cut, off0: app.offset};
    pb.setPointerCapture(e.pointerId);
    e.preventDefault(); e.stopPropagation();
  });
  pb.addEventListener("pointermove", (e) => {
    if (!drag) return;
    const sr = app.config.samp_rate || 1;
    const dHz = xToOffset(e.clientX) - xToOffset(drag.startX);
    const MIN = 100;           // Hz minimum passband width
    if (drag.kind === "low") {
      app.low_cut = Math.min(drag.low0 + dHz, app.high_cut - MIN);
      app.low_cut = Math.max(app.low_cut, -sr / 2);
    } else if (drag.kind === "high") {
      app.high_cut = Math.max(drag.high0 + dHz, app.low_cut + MIN);
      app.high_cut = Math.min(app.high_cut, sr / 2);
    } else {
      app.offset = drag.off0 + dHz;
      updateFreq();
    }
    drawPassband();
    sendCuts(false);
  });
  const finish = (e) => {
    if (!drag) return;
    sendCuts(true);
    drag = null;
  };
  pb.addEventListener("pointerup", finish);
  pb.addEventListener("pointercancel", finish);
})();

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
      redrawOverlays();
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
    redrawOverlays();
  });
})();

document.getElementById("squelch").addEventListener("input", (e) => {
  send({type: "dspcontrol", params: {squelch_level: parseFloat(e.target.value)}});
});

document.getElementById("zoom").addEventListener("input", (e) => {
  app.waterfall.zoom = Math.pow(2, parseInt(e.target.value));
  const sr = app.config.samp_rate || 1;
  app.waterfall.center = app.offset / sr + 0.5;
  redrawOverlays();
});

document.getElementById("volume").addEventListener("input", (e) => {
  app.audio.setVolume(parseFloat(e.target.value));
});

document.getElementById("mute").addEventListener("click", () => {
  app.audio.start().then(() => {
    document.getElementById("mute").textContent = "Audio ✓";
    document.getElementById("audio-stats").style.display = "inline";
  });
});

/* audio buffer/underrun stats readout (reference AudioEngine stats) */
setInterval(() => {
  const el = document.getElementById("audio-stats");
  if (!el || el.style.display === "none") return;
  const s = app.audio.getStats();
  el.textContent = `${s.mode} · ${s.bufferedMs} ms · ${s.underruns} drops`;
}, 1000);

/* UTC clock + connection-quality dot (reference clock/progressbars):
   green = frames flowing, amber = waterfall stalled >2 s or audio
   underruns accumulating, red = socket down */
app.lastFrame = 0;
setInterval(() => {
  const clock = document.getElementById("clock");
  if (clock) clock.textContent = new Date().toISOString()
    .slice(11, 19) + " UTC";
  const dot = document.getElementById("conn-quality");
  if (!dot) return;
  const open = app.ws && app.ws.readyState === WebSocket.OPEN;
  const fresh = Date.now() - app.lastFrame < 2000;
  const s = app.audio.getStats ? app.audio.getStats() : {underruns: 0};
  const drops = s.underruns > (app._lastDrops || 0);
  app._lastDrops = s.underruns;
  dot.style.color = !open ? "#e53935"
    : (fresh && !drops) ? "#2e7d32" : "#fbc02d";
  dot.title = !open ? "disconnected"
    : `connection ok — ${s.bufferedMs || 0} ms audio buffered`;
}, 1000);

document.getElementById("record").addEventListener("click", (e) => {
  if (app.audio.recorder) {
    const blob = app.audio.stopRecording();
    e.target.classList.remove("active");
    e.target.textContent = "Rec";
    if (blob) {
      const a = document.createElement("a");
      a.href = URL.createObjectURL(blob);
      a.download = `openwebrx-${new Date().toISOString().replace(/[:.]/g, "-")}.wav`;
      a.click();
      setTimeout(() => URL.revokeObjectURL(a.href), 5000);
    }
  } else {
    app.audio.startRecording();
    e.target.classList.add("active");
    e.target.textContent = "Rec ●";
  }
});

document.getElementById("profiles").addEventListener("change", (e) => {
  send({type: "selectprofile", params: {profile: e.target.value}});
});

/* waterfall theme + level mode controls */
(() => {
  const themeSel = document.getElementById("wf-theme");
  for (const name of Object.keys(WATERFALL_THEMES)) {
    const o = document.createElement("option");
    o.value = name; o.textContent = name;
    if (name === app.waterfall.theme) o.selected = true;
    themeSel.appendChild(o);
  }
  themeSel.addEventListener("change", (e) => app.waterfall.setTheme(e.target.value));
  const modeSel = document.getElementById("wf-levels");
  modeSel.addEventListener("change", (e) => {
    app.waterfall.setLevelMode(e.target.value);
    document.getElementById("wf-manual").style.display =
      e.target.value === "fixed" ? "inline" : "none";
  });
  const apply = () => app.waterfall.setLevels(
    parseFloat(document.getElementById("wf-min").value),
    parseFloat(document.getElementById("wf-max").value));
  document.getElementById("wf-min").addEventListener("input", apply);
  document.getElementById("wf-max").addEventListener("input", apply);
})();

document.getElementById("bookmark-add").addEventListener("click", () => {
  app.bookmarkDialog.open(null);
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
  const dec = document.getElementById("decoded");
  dec.textContent = "";
  app.messagePanels.clearAll();
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
    case "b": app.bookmarkDialog.open(null); break;
    case "l": window.Lookup && Lookup.open(); break;
    case " ": document.getElementById("mute").click(); e.preventDefault(); break;
    case "?": toggleShortcutHelp(); break;
  }
});

/* '?' overlay listing the bindings (reference lib/shortcuts help dialog) */
function toggleShortcutHelp() {
  let el = document.getElementById("shortcut-help");
  if (el) { el.remove(); return; }
  el = document.createElement("div");
  el.id = "shortcut-help";
  el.className = "dialog-backdrop";
  const rows = [
    ["\u2190 / \u2192", "tune down / up one step"],
    ["z / Z", "zoom in / out"],
    ["s", "toggle spectrum graph"],
    ["b", "add bookmark at current frequency"],
    ["l", "open the lookup panel"],
    ["space", "mute / unmute"],
    ["?", "this help"],
  ].map(([k, d]) =>
    `<tr><td class="key">${k}</td><td>${d}</td></tr>`).join("");
  el.innerHTML = `<div class="dialog"><h3>Keyboard shortcuts</h3>
    <table class="shortcut-table">${rows}</table>
    <div class="dialog-buttons"><button class="primary">close</button></div>
    </div>`;
  el.querySelector("button").onclick = () => el.remove();
  el.onclick = (ev) => { if (ev.target === el) el.remove(); };
  document.body.appendChild(el);
}

connect();
