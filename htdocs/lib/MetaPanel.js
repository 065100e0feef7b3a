/* Metadata panels for digital voice / broadcast modes.
 *
 * Parity targets from the reference htdocs/lib/MetaPanel.js (944 LoC):
 * DMR (2 timeslots, talker alias, source/target ids), YSF, D-Star, M17,
 * NXDN, DAB (ensemble/service labels), HD Radio, DRM status, RDS
 * (PI/PS/radiotext/program type). Implementation is original: one panel
 * class per protocol, swapped in a fixed container as metadata arrives,
 * cleared after a hold timeout when the carrier drops.
 */
"use strict";

function metaEl(tag, cls, text) {
  const e = document.createElement(tag);
  if (cls) e.className = cls;
  if (text !== undefined) e.textContent = text;
  return e;
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
}

/* DMR: two independent timeslots (reference DmrMetaSlot) */
class DmrMetaPanel extends BaseMetaPanel {
  constructor() {
    super("DMR");
    this.slots = [];
    for (const n of [1, 2]) {
      const box = metaEl("div", "meta-slot");
      box.appendChild(metaEl("div", "meta-slot-head", `TS${n}`));
      const source = metaEl("div", "meta-big", "—");
      const extra = metaEl("div", "meta-small", "");
      const target = metaEl("div", "meta-small", "");
      box.appendChild(source); box.appendChild(extra); box.appendChild(target);
      this.root.appendChild(box);
      this.slots.push({box, source, extra, target, timer: null});
    }
  }
  update(meta) {
    const idx = (parseInt(meta.slot) || 1) - 1;
    const s = this.slots[Math.max(0, Math.min(1, idx))];
    if (meta.sync === "voice" || meta.source !== undefined) {
      s.box.classList.add("rx");
      s.source.textContent = meta.talkeralias ||
        (meta.additional && (meta.additional.callsign || meta.additional.name)) ||
        meta.source || "—";
      const extras = [];
      if (meta.source) extras.push(`id ${meta.source}`);
      if (meta.additional && meta.additional.name &&
          s.source.textContent !== meta.additional.name)
        extras.push(meta.additional.name);
      s.extra.textContent = extras.join(" · ");
      s.target.textContent = meta.type === "group" ? `TG ${meta.target}` :
        (meta.target !== undefined ? `→ ${meta.target}` : "");
      if (s.timer) clearTimeout(s.timer);
      s.timer = setTimeout(() => {
        s.box.classList.remove("rx");
        s.source.textContent = "—"; s.extra.textContent = "";
        s.target.textContent = "";
      }, 4000);
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
    this.dest = metaEl("div", "meta-small", "");
    this.root.appendChild(this.source);
    this.root.appendChild(this.detail);
    this.root.appendChild(this.dest);
  }
  update(meta) {
    this.root.classList.add("rx");
    this.source.textContent = meta.source || meta.ourcall || meta.m17_source ||
      "—";
    const details = [];
    if (meta.lat !== undefined && meta.lon !== undefined)
      details.push(`${(+meta.lat).toFixed(4)} ${(+meta.lon).toFixed(4)}`);
    if (meta.mode) details.push(meta.mode);
    if (meta.up) details.push(`via ${meta.up}`);
    this.detail.textContent = details.join(" · ");
    this.dest.textContent = meta.target || meta.yourcall || meta.destination || "";
    this.touch();
  }
  clear() {
    super.clear();
    this.source.textContent = "—";
    this.detail.textContent = ""; this.dest.textContent = "";
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

/* DAB: ensemble + service labels (dablin meta) */
class DabMetaPanel extends BaseMetaPanel {
  constructor() {
    super("DAB");
    this.root.appendChild(metaEl("div", "meta-slot-head", "DAB"));
    this.ensemble = this.field("ensemble");
    this.service = metaEl("div", "meta-big", "");
    this.root.appendChild(this.service);
    this.programme = this.field("programme");
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

/* HD Radio (nrsc5): station / slogan / title / artist */
class HdrMetaPanel extends BaseMetaPanel {
  constructor() {
    super("HDR");
    this.root.appendChild(metaEl("div", "meta-slot-head", "HD Radio"));
    this.station = metaEl("div", "meta-big", "");
    this.root.appendChild(this.station);
    this.title = this.field("title");
    this.artist = this.field("artist");
    this.slogan = this.field("slogan");
  }
  update(meta) {
    this.root.classList.add("rx");
    if (meta.station !== undefined) this.station.textContent = meta.station;
    if (meta.title !== undefined) this.title.textContent = meta.title;
    if (meta.artist !== undefined) this.artist.textContent = meta.artist;
    if (meta.slogan !== undefined) this.slogan.textContent = meta.slogan;
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
  }
  update(meta) {
    this.root.classList.add("rx");
    for (const [k, l] of Object.entries(this.lights)) {
      if (meta[k] !== undefined)
        l.className = "meta-light " + (meta[k] ? "ok" : "bad");
    }
    if (meta.label !== undefined) this.label.textContent = meta.label;
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
