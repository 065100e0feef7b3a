/* Metadata panels for digital voice / broadcast modes.
 *
 * Parity targets from the reference htdocs/lib/MetaPanel.js (944 LoC):
 * DMR (2 timeslots, talker alias, source/target ids, group/direct),
 * YSF (callsigns, repeater up/down, radio type, position), D-Star
 * (callsigns, message, position), M17 (src/dest, CAN), NXDN, DAB
 * (ensemble/service labels, service list, bitrate), HD Radio (station,
 * title/artist/album, program selector), DRM status lights + label,
 * RDS (PI/PS/radiotext/program type/clock).  Implementation is
 * original: one panel class per protocol, swapped in a fixed container
 * as metadata arrives, cleared after a hold timeout when the carrier
 * drops; positions render as clickable map links.
 */
"use strict";

function metaEl(tag, cls, text) {
  const e = document.createElement(tag);
  if (cls) e.className = cls;
  if (text !== undefined) e.textContent = text;
  return e;
}

/* clickable position: opens the receiver map centered on the talker */
function metaPosition(lat, lon) {
  const a = metaEl("a", "meta-pos",
                   `${(+lat).toFixed(4)} ${(+lon).toFixed(4)}`);
  a.href = `map.html?lat=${(+lat).toFixed(5)}&lon=${(+lon).toFixed(5)}`;
  a.target = "openwebrx-map";
  return a;
}

class BaseMetaPanel {
  constructor(protocol) {
    this.protocol = protocol;
    this.root = metaEl("div", "meta-panel");
    this.holdMs = 4000;
    this.clearTimer = null;
  }
  /* schedule auto-clear; every update pushes the deadline out */
  touch() {
    if (this.clearTimer) clearTimeout(this.clearTimer);
    this.clearTimer = setTimeout(() => this.clear(), this.holdMs);
  }
  clear() { this.root.classList.remove("rx"); }
  field(label) {
    const wrap = metaEl("div", "meta-field");
    wrap.appendChild(metaEl("span", "meta-label", label));
    const v = metaEl("span", "meta-value");
    wrap.appendChild(v);
    this.root.appendChild(wrap);
    return v;
  }
  /* flag + callsign when the Lookup cache can resolve it */
  callsignText(el, callsign) {
    el.textContent = callsign;
    if (window.Lookup && /^[A-Z0-9/]{3,}$/i.test(callsign)) {
      const f = Lookup.callsignFlag(callsign,
        info => { if (info && info.ccode)
          el.textContent = `${Lookup.flag(info.ccode)} ${callsign}`; });
      if (f) el.textContent = `${f} ${callsign}`;
    }
  }
}

/* DMR: two independent timeslots (reference DmrMetaSlot) */
class DmrMetaPanel extends BaseMetaPanel {
  constructor() {
    super("DMR");
    this.slots = [];
    for (const n of [1, 2]) {
      const box = metaEl("div", "meta-slot");
      const head = metaEl("div", "meta-slot-head", `TS${n}`);
      const badge = metaEl("span", "meta-badge", "");
      head.appendChild(badge);
      box.appendChild(head);
      const source = metaEl("div", "meta-big", "—");
      const extra = metaEl("div", "meta-small", "");
      const target = metaEl("div", "meta-small", "");
      box.appendChild(source); box.appendChild(extra); box.appendChild(target);
      this.root.appendChild(box);
      this.slots.push({box, badge, source, extra, target, timer: null});
    }
  }
  _clearSlot(s) {
    s.box.classList.remove("rx");
    s.source.textContent = "—"; s.extra.textContent = "";
    s.target.textContent = ""; s.badge.textContent = "";
  }
  update(meta) {
    const idx = (parseInt(meta.timeslot || meta.slot) || 1) - 1;
    const s = this.slots[Math.max(0, Math.min(1, idx))];
    if (meta.end) { this._clearSlot(s); return; }
    if (meta.sync === "voice" || meta.source !== undefined) {
      s.box.classList.add("rx");
      s.source.textContent = meta.talkeralias ||
        (meta.additional && (meta.additional.callsign || meta.additional.name)) ||
        meta.source || "—";
      s.badge.textContent = meta.type === "group" ? "GROUP" :
        (meta.type === "direct" ? "DIRECT" : "");
      const extras = [];
      if (meta.source) extras.push(`id ${meta.source}`);
      if (meta.additional && meta.additional.name &&
          s.source.textContent !== meta.additional.name)
        extras.push(meta.additional.name);
      if (meta.color_code !== undefined) extras.push(`CC${meta.color_code}`);
      s.extra.textContent = extras.join(" · ");
      s.target.textContent = meta.type === "group" ? `TG ${meta.target}` :
        (meta.target !== undefined ? `→ ${meta.target}` : "");
      if (s.timer) clearTimeout(s.timer);
      s.timer = setTimeout(() => this._clearSlot(s), 4000);
    }
  }
}

/* generic single-talker digital voice (YSF / D-Star / NXDN / M17) */
class DvMetaPanel extends BaseMetaPanel {
  constructor(protocol) {
    super(protocol);
    this.root.appendChild(metaEl("div", "meta-slot-head", protocol));
    this.source = metaEl("div", "meta-big", "—");
    this.detail = metaEl("div", "meta-small", "");
    this.path = metaEl("div", "meta-small", "");
    this.message = metaEl("div", "meta-rt", "");
    this.dest = metaEl("div", "meta-small", "");
    this.pos = metaEl("div", "meta-small", "");
    this.root.appendChild(this.source);
    this.root.appendChild(this.detail);
    this.root.appendChild(this.path);
    this.root.appendChild(this.message);
    this.root.appendChild(this.dest);
    this.root.appendChild(this.pos);
  }
  update(meta) {
    if (meta.end) { this.clear(); return; }
    this.root.classList.add("rx");
    const src = meta.source || meta.ourcall || meta.m17_source;
    if (src) this.callsignText(this.source, src);
    const details = [];
    if (meta.mode) details.push(meta.mode);
    if (meta.radio) details.push(meta.radio);          /* YSF radio type */
    if (meta.dgid !== undefined) details.push(`DG-ID ${meta.dgid}`);
    if (meta.can !== undefined) details.push(`CAN ${meta.can}`);  /* M17 */
    this.detail.textContent = details.join(" · ");
    /* repeater path: YSF up/down, D-Star departure/destination rptrs */
    const path = [];
    if (meta.up) path.push(`via ${meta.up}`);
    if (meta.down) path.push(`→ ${meta.down}`);
    if (meta.departure) path.push(`via ${meta.departure}`);
    if (meta.destination_rptr) path.push(`→ ${meta.destination_rptr}`);
    this.path.textContent = path.join(" ");
    /* D-Star 20-char message / DPRS comment */
    this.message.textContent = meta.message || meta.comment || "";
    this.dest.textContent = meta.target || meta.yourcall ||
      meta.destination || "";
    this.pos.innerHTML = "";
    if (meta.lat !== undefined && meta.lon !== undefined)
      this.pos.appendChild(metaPosition(meta.lat, meta.lon));
    this.touch();
  }
  clear() {
    super.clear();
    this.source.textContent = "—";
    this.detail.textContent = ""; this.path.textContent = "";
    this.message.textContent = ""; this.dest.textContent = "";
    this.pos.innerHTML = "";
  }
}

/* RDS (WFM broadcast): PI, PS, program type, radiotext, clock */
class RdsMetaPanel extends BaseMetaPanel {
  constructor() {
    super("RDS");
    this.root.appendChild(metaEl("div", "meta-slot-head", "FM RDS"));
    this.ps = metaEl("div", "meta-big", "");
    this.root.appendChild(this.ps);
    this.rt = metaEl("div", "meta-rt", "");
    this.root.appendChild(this.rt);
    this.pi = this.field("PI");
    this.pty = this.field("PTY");
    this.ct = this.field("clock");
  }
  update(meta) {
    this.root.classList.add("rx");
    if (meta.ps || meta.partial_ps) this.ps.textContent = meta.ps || meta.partial_ps;
    if (meta.radiotext !== undefined) this.rt.textContent = meta.radiotext;
    if (meta.pi !== undefined) this.pi.textContent = meta.pi;
    if (meta.prog_type !== undefined) this.pty.textContent = meta.prog_type;
    if (meta.clock_time !== undefined) this.ct.textContent = meta.clock_time;
    this.holdMs = 30000;
    this.touch();
  }
}

/* DAB: ensemble + service labels + service list (dablin meta) */
class DabMetaPanel extends BaseMetaPanel {
  constructor() {
    super("DAB");
    this.root.appendChild(metaEl("div", "meta-slot-head", "DAB"));
    this.ensemble = this.field("ensemble");
    this.service = metaEl("div", "meta-big", "");
    this.root.appendChild(this.service);
    this.programme = this.field("programme");
    this.audio = this.field("audio");
    this.services = metaEl("div", "meta-services");
    this.root.appendChild(this.services);
  }
  update(meta) {
    this.root.classList.add("rx");
    if (meta.ensemble_label !== undefined)
      this.ensemble.textContent = meta.ensemble_label;
    if (meta.service_label !== undefined)
      this.service.textContent = meta.service_label;
    if (meta.programme !== undefined)
      this.programme.textContent = meta.programme;
    const audio = [];
    if (meta.bitrate) audio.push(`${meta.bitrate} kbit/s`);
    if (meta.audio_mode) audio.push(meta.audio_mode);
    if (meta.codec) audio.push(meta.codec);
    if (audio.length) this.audio.textContent = audio.join(" · ");
    if (Array.isArray(meta.services)) {
      this.services.innerHTML = "";
      for (const s of meta.services) {
        const b = metaEl("button", "meta-service-btn", s.label || s.id);
        b.onclick = () => {
          if (window.app && window.app.ws)
            window.app.ws.send(JSON.stringify(
              {type: "dspcontrol", params: {dab_service_id: s.id}}));
        };
        this.services.appendChild(b);
      }
    }
    this.holdMs = 30000;
    this.touch();
  }
}

/* HD Radio (nrsc5): station / slogan / title / artist / programs */
class HdrMetaPanel extends BaseMetaPanel {
  constructor() {
    super("HDR");
    this.root.appendChild(metaEl("div", "meta-slot-head", "HD Radio"));
    this.station = metaEl("div", "meta-big", "");
    this.root.appendChild(this.station);
    this.title = this.field("title");
    this.artist = this.field("artist");
    this.album = this.field("album");
    this.slogan = this.field("slogan");
    this.programs = metaEl("div", "meta-services");
    this.root.appendChild(this.programs);
  }
  update(meta) {
    this.root.classList.add("rx");
    if (meta.station !== undefined) this.station.textContent = meta.station;
    if (meta.title !== undefined) this.title.textContent = meta.title;
    if (meta.artist !== undefined) this.artist.textContent = meta.artist;
    if (meta.album !== undefined) this.album.textContent = meta.album;
    if (meta.slogan !== undefined) this.slogan.textContent = meta.slogan;
    if (Array.isArray(meta.programs)) {
      this.programs.innerHTML = "";
      for (const p of meta.programs) {
        const b = metaEl("button", "meta-service-btn",
                         p.name || `HD${(p.id ?? 0) + 1}`);
        b.onclick = () => {
          if (window.app && window.app.ws)
            window.app.ws.send(JSON.stringify(
              {type: "dspcontrol", params: {hdr_program: p.id}}));
        };
        this.programs.appendChild(b);
      }
    }
    this.holdMs = 30000;
    this.touch();
  }
}

/* DRM (dream status socket): sync / FAC / SDC / audio status lights */
class DrmMetaPanel extends BaseMetaPanel {
  constructor() {
    super("DRM");
    this.root.appendChild(metaEl("div", "meta-slot-head", "DRM"));
    this.lights = {};
    const row = metaEl("div", "meta-lights");
    for (const k of ["IO", "Time", "Frame", "FAC", "SDC", "Audio"]) {
      const l = metaEl("span", "meta-light", k);
      this.lights[k.toLowerCase()] = l;
      row.appendChild(l);
    }
    this.root.appendChild(row);
    this.label = metaEl("div", "meta-big", "");
    this.root.appendChild(this.label);
    this.info = this.field("signal");
    this.text = metaEl("div", "meta-rt", "");
    this.root.appendChild(this.text);
  }
  update(meta) {
    this.root.classList.add("rx");
    for (const [k, l] of Object.entries(this.lights)) {
      if (meta[k] !== undefined)
        l.className = "meta-light " + (meta[k] ? "ok" : "bad");
    }
    if (meta.label !== undefined) this.label.textContent = meta.label;
    const sig = [];
    if (meta.mode) sig.push(`mode ${meta.mode}`);
    if (meta.bitrate) sig.push(`${meta.bitrate} kbit/s`);
    if (meta.snr !== undefined) sig.push(`${(+meta.snr).toFixed(1)} dB`);
    if (sig.length) this.info.textContent = sig.join(" · ");
    if (meta.text_message !== undefined)
      this.text.textContent = meta.text_message;
    this.holdMs = 15000;
    this.touch();
  }
}

class MetaPanelManager {
  constructor(container) {
    this.container = container;
    this.panels = new Map();
    this.current = null;
  }
  panelFor(protocol) {
    const key = String(protocol || "").toUpperCase();
    let p = this.panels.get(key);
    if (!p) {
      if (key === "DMR") p = new DmrMetaPanel();
      else if (["YSF", "DSTAR", "D-STAR", "NXDN", "M17", "DPRS"].includes(key))
        p = new DvMetaPanel(key);
      else if (key === "RDS") p = new RdsMetaPanel();
      else if (key === "DAB") p = new DabMetaPanel();
      else if (["HDR", "HDRADIO"].includes(key)) p = new HdrMetaPanel();
      else if (key === "DRM") p = new DrmMetaPanel();
      else p = new DvMetaPanel(key || "META");
      this.panels.set(key, p);
      this.container.appendChild(p.root);
      p.root.style.display = "none";
    }
    return p;
  }
  update(meta) {
    /* RDS metadata arrives mode-tagged, DV metadata protocol-tagged */
    const protocol = meta.protocol || meta.mode;
    if (!protocol) return;
    const panel = this.panelFor(protocol);
    if (this.current && this.current !== panel)
      this.current.root.style.display = "none";
    panel.root.style.display = "block";
    this.container.style.display = "block";
    this.current = panel;
    panel.update(meta);
  }
  hide() {
    if (this.current) this.current.root.style.display = "none";
    this.container.style.display = "none";
    this.current = null;
  }
}

window.MetaPanelManager = MetaPanelManager;
