/* Per-mode decode panels with a tab bar.
 *
 * Parity targets from the reference htdocs/lib/MessagePanel.js (985 LoC):
 * WSJT table, packet/APRS table, paging table, ADSB live aircraft table,
 * DSC panel, CW-skimmer panel, SELCALL/EAS/ISM rows; plus the JS8 thread
 * view from lib/Js8Threads.js (175 LoC). Implementation is original:
 * panels register for event "mode" keys; tabs appear as data arrives.
 */
"use strict";

function el(tag, attrs, ...children) {
  const e = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs || {})) {
    if (k === "style") Object.assign(e.style, v);
    else if (k.startsWith("on")) e[k] = v;
    else e.setAttribute(k, v);
  }
  for (const c of children)
    e.appendChild(typeof c === "string" ? document.createTextNode(c) : c);
  return e;
}

function utcNow() { return new Date().toISOString().slice(11, 19); }

/* base: a capped scrolling table */
class TablePanel {
  constructor(title, columns) {
    this.title = title;
    this.columns = columns;                  /* [{key, label, fmt?}] */
    this.maxRows = 100;
    this.maxAgeMs = 15 * 60 * 1000;          /* reference clear timer */
    this.root = el("div", {class: "msg-panel"});
    /* header: title + clear (reference MessagePanel initClearButton) */
    const head = el("div", {class: "msg-head"});
    head.appendChild(el("span", {class: "msg-title"}, title));
    const clearBtn = el("button", {class: "msg-clear"}, "clear");
    clearBtn.onclick = () => this.clear();
    head.appendChild(clearBtn);
    this.root.appendChild(head);
    this.table = el("table", {class: "msg-table"});
    const hr = el("tr");
    hr.appendChild(el("th", {}, "UTC"));
    for (const c of columns) hr.appendChild(el("th", {}, c.label));
    this.table.appendChild(el("thead", {}, hr));
    this.body = el("tbody");
    this.table.appendChild(this.body);
    this.root.appendChild(this.table);
    /* age-out sweep (reference initClearTimer): drop rows older than
       maxAgeMs so a panel left open overnight doesn't hold the DOM */
    this._sweep = setInterval(() => {
      const cutoff = Date.now() - this.maxAgeMs;
      while (this.body.firstChild &&
             +(this.body.firstChild.dataset.ts || 0) < cutoff)
        this.body.removeChild(this.body.firstChild);
    }, 60000);
  }
  cellText(ev, c) {
    let v = ev[c.key];
    if (c.fmt) v = c.fmt(v, ev);
    if (v === undefined || v === null) return "";
    return typeof v === "string" ? v : String(v);
  }
  add(ev) {
    const tr = el("tr");
    tr.dataset.ts = String(Date.now());
    tr.appendChild(el("td", {}, utcNow()));
    for (const c of this.columns) {
      const td = el("td", {}, this.cellText(ev, c));
      if (c.cls) td.className = c.cls(ev) || "";
      if (c.lookup) {
        const text = this.cellText(ev, c);
        if (text && window.Lookup) {
          td.classList.add("lookup-link");
          td.onclick = () => window.Lookup.show(text);
        }
      }
      if (c.flagQuery && window.Lookup) {
        /* async country flag cell: renders when the server's lookup
           answers (cached thereafter — reference panels show flags
           beside callsigns/MMSIs via Lookup tables) */
        const q = c.flagQuery(ev);
        if (q) {
          const fill = (info) => {
            if (info) td.textContent = Lookup.countryText(info);
          };
          const info = Lookup.resolve(q, fill);
          if (info) fill(info);
        }
      }
      tr.appendChild(td);
    }
    this.body.appendChild(tr);
    while (this.body.children.length > this.maxRows)
      this.body.removeChild(this.body.firstChild);
    tr.scrollIntoView({block: "nearest"});
  }
  clear() { this.body.innerHTML = ""; }
}

class WsjtPanel extends TablePanel {
  constructor() {
    super("WSJT", [
      {key: "mode", label: "mode"},
      {key: "db", label: "dB"},
      {key: "dt", label: "DT"},
      {key: "freq", label: "freq", fmt: (v) => v ? (v / 1e6).toFixed(6) : ""},
      {key: "msg", label: "message"},
      {key: "callsign", label: "call", lookup: true},
      {key: "locator", label: "grid"},
      {key: "_country", label: "country",
       flagQuery: (ev) => ev.callsign},
    ]);
  }
}

class PacketPanel extends TablePanel {
  constructor() {
    super("Packet", [
      {key: "source", label: "from", lookup: true},
      {key: "_country", label: "country",
       flagQuery: (ev) => (ev.source || "").split("-")[0]},
      {key: "destination", label: "to"},
      {key: "symbol", label: "sym",
       fmt: (v, ev) => v ? `${ev.symboltable || "/"}${v}` : ""},
      {key: "lat", label: "position",
       fmt: (v, ev) => (v !== undefined && ev.lon !== undefined)
         ? `${v.toFixed(4)} ${ev.lon.toFixed(4)}` : ""},
      {key: "comment", label: "comment",
       fmt: (v, ev) => v || ev.message || ev.status || ""},
    ]);
  }
}

class PagingPanel extends TablePanel {
  constructor() {
    super("Paging", [
      {key: "mode", label: "proto",
       fmt: (v, ev) => ev.protocol ? `${v}/${ev.protocol}` : v},
      {key: "address", label: "address"},
      {key: "function", label: "fn"},
      {key: "message", label: "message", fmt: (v, ev) => v || ev.alpha || ""},
    ]);
  }
}

class DscPanel extends TablePanel {
  constructor() {
    super("DSC", [
      {key: "format", label: "format"},
      {key: "src", label: "from (MMSI)", lookup: true,
       fmt: (v, ev) => v || ev.mmsi || ""},
      {key: "_country", label: "country",
       flagQuery: (ev) => ev.src || ev.mmsi},
      {key: "dst", label: "to"},
      {key: "category", label: "category"},
      {key: "telecommand", label: "telecommand",
       fmt: (v, ev) => v || (ev.telecommands || []).join(" ")},
      {key: "position", label: "position",
       fmt: (v, ev) => v || (ev.lat !== undefined
         ? `${ev.lat} ${ev.lon}` : "")},
    ]);
  }
}

class CwSkimmerPanel extends TablePanel {
  constructor() {
    super("CW", [
      {key: "freq", label: "freq",
       fmt: (v) => v !== undefined ? (v / 1e6).toFixed(4) : ""},
      {key: "wpm", label: "wpm"},
      {key: "text", label: "text", fmt: (v, ev) => v || ev.msg || ""},
    ]);
  }
}

class EasPanel extends TablePanel {
  constructor() {
    super("EAS", [
      {key: "event", label: "event", fmt: (v, ev) => v || ev.raw || ""},
      {key: "originator", label: "originator"},
      {key: "areas", label: "areas",
       fmt: (v) => Array.isArray(v) ? v.join("; ") : (v || "")},
      {key: "text", label: "message",
       fmt: (v, ev) => v || (ev.eom ? "— end of message —" : "")},
    ]);
  }
}

class IsmPanel extends TablePanel {
  constructor() {
    super("ISM", [
      {key: "model", label: "model"},
      {key: "id", label: "id"},
      {key: "temperature_C", label: "temp °C"},
      {key: "humidity", label: "hum %"},
      {key: "raw", label: "data",
       fmt: (v, ev) => v || JSON.stringify(Object.fromEntries(
         Object.entries(ev).filter(([k]) =>
           !["mode","model","id","temperature_C","humidity","time"].includes(k))))},
    ]);
  }
}

/* ADSB/aircraft: a keyed live table — one row per aircraft updated in
 * place, aged out after 60 s (reference MessagePanel.js ADSB table). */
class AircraftPanel {
  constructor() {
    this.title = "Aircraft";
    this.aircraft = new Map();               /* key → {fields, seen, tr} */
    this.root = el("div", {class: "msg-panel"});
    this.table = el("table", {class: "msg-table"});
    const hr = el("tr");
    /* reference ADSB column set (MessagePanel.js ADSB table) plus HFDL
       detail (freq); registration/country come from the server's ICAO
       allocation decode (services/icao.py) */
    this.COLS = ["mode", "icao", "flight", "reg", "country", "squawk",
                 "alt ft", "spd kt", "trk°", "v ft/m", "freq",
                 "position", "last"];
    for (const h of this.COLS) hr.appendChild(el("th", {}, h));
    this.table.appendChild(el("thead", {}, hr));
    this.body = el("tbody");
    this.table.appendChild(this.body);
    this.root.appendChild(this.table);
    this.timer = setInterval(() => this.tick(), 5000);
  }
  add(ev) {
    const key = ev.icao || ev.tail || ev.flight;
    if (!key) return;
    let rec = this.aircraft.get(key);
    if (!rec) {
      rec = {fields: {}, tr: el("tr")};
      for (let i = 0; i < this.COLS.length; i++)
        rec.tr.appendChild(el("td"));
      this.aircraft.set(key, rec);
      this.body.appendChild(rec.tr);
      rec.tr.children[1].style.cursor = "pointer";
      rec.tr.children[1].onclick = () =>
        window.Lookup && Lookup.show(rec.fields.icao || key, "aircraft");
    }
    Object.assign(rec.fields, ev);
    rec.seen = Date.now();
    this.render(rec);
  }
  render(rec) {
    const f = rec.fields, tds = rec.tr.children;
    const flag = (window.Lookup && f.ccode) ? Lookup.flag(f.ccode) : "";
    tds[0].textContent = f.mode || "";
    tds[1].textContent = f.icao || f.tail || "";
    tds[2].textContent = f.flight || "";
    tds[3].textContent = f.registration || f.tail || "";
    tds[4].textContent = flag ? `${flag} ${f.ccode}` : (f.country || "");
    tds[5].textContent = f.squawk || "";
    tds[6].textContent = f.altitude !== undefined ? f.altitude : "";
    tds[7].textContent = f.groundspeed !== undefined
      ? Math.round(f.groundspeed) : "";
    tds[8].textContent = f.track !== undefined ? Math.round(f.track) : "";
    tds[9].textContent = f.vspeed !== undefined ? f.vspeed : "";
    tds[10].textContent = f.freq_mhz !== undefined ? f.freq_mhz : "";
    tds[11].textContent = (f.lat !== undefined && f.lon !== undefined)
      ? `${(+f.lat).toFixed(3)} ${(+f.lon).toFixed(3)}` : "";
    tds[12].textContent = Math.round((Date.now() - rec.seen) / 1000) + "s";
  }
  tick() {
    const cutoff = Date.now() - 300 * 1000;
    for (const [key, rec] of this.aircraft) {
      if (rec.seen < cutoff) { rec.tr.remove(); this.aircraft.delete(key); }
      else this.render(rec);
    }
  }
  clear() {
    this.aircraft.clear();
    this.body.innerHTML = "";
  }
}

/* JS8 thread view: messages grouped per audio-offset "thread", rendered
 * as chat bubbles (reference lib/Js8Threads.js). */
class Js8Panel {
  constructor() {
    this.title = "JS8";
    this.threads = new Map();                /* freq bucket → div */
    this.root = el("div", {class: "msg-panel js8-threads"});
  }
  threadFor(ev) {
    const bucket = Math.round((ev.freq || ev.offset || 0) / 10) * 10;
    let t = this.threads.get(bucket);
    if (!t) {
      t = el("div", {class: "js8-thread"},
        el("div", {class: "js8-thread-head"},
          `thread @ ${bucket} Hz`));
      this.threads.set(bucket, t);
      this.root.insertBefore(t, this.root.firstChild);
    }
    return t;
  }
  add(ev) {
    const t = this.threadFor(ev);
    const cls = ev.thread_type === "heartbeat" ? "js8-msg js8-hb" : "js8-msg";
    const meta = `${utcNow()} ${ev.db !== undefined ? ev.db + " dB" : ""}`;
    t.appendChild(el("div", {class: cls},
      el("span", {class: "js8-meta"}, meta + " "),
      String(ev.msg || ev.text || "")));
    while (t.children.length > 25) t.removeChild(t.children[1]);
    while (this.threads.size > 8) {
      const [k, v] = this.threads.entries().next().value;
      v.remove(); this.threads.delete(k);
    }
  }
  clear() { this.threads.clear(); this.root.innerHTML = ""; }
}

/* fallback generic table for modes without a dedicated panel */
class GenericPanel extends TablePanel {
  constructor() {
    super("Messages", [
      {key: "mode", label: "mode"},
      {key: "source", label: "from",
       fmt: (v, ev) => v || ev.address || ev.callsign || ev.station || ""},
      {key: "comment", label: "info",
       fmt: (v, ev) => v || ev.message || ev.text || ev.header || ev.raw ||
         (ev.lat !== undefined ? `${ev.lat} ${ev.lon}` : "") || ""},
    ]);
  }
}

class MessagePanelManager {
  constructor(container) {
    this.container = container;
    this.tabBar = el("div", {class: "msg-tabs"});
    this.panelArea = el("div", {class: "msg-area"});
    container.appendChild(this.tabBar);
    container.appendChild(this.panelArea);
    this.panels = new Map();                 /* title → {panel, tab} */
    this.routes = [];                        /* [modes[], factory] */
    this.active = null;

    this.route("WSJT",
               ["FT8","FT4","JT65","JT9","WSPR","FST4","FST4W","Q65","MSK144"],
               () => new WsjtPanel());
    this.route("Packet", ["APRS","AIS","PACKET"], () => new PacketPanel());
    this.route("Paging", ["POCSAG","FLEX","PAGE"], () => new PagingPanel());
    this.route("DSC", ["DSC"], () => new DscPanel());
    this.route("CW", ["CW","CWSKIMMER"], () => new CwSkimmerPanel());
    this.route("EAS", ["EAS"], () => new EasPanel());
    this.route("ISM", ["ISM","WMBUS"], () => new IsmPanel());
    this.route("Aircraft", ["ADSB","VDL2","HFDL","ACARS"],
               () => new AircraftPanel());
    this.route("JS8", ["JS8"], () => new Js8Panel());
    this.generic = null;
  }

  route(title, modes, factory) {
    this.routes.push({title, modes: modes.map(m => m.toUpperCase()), factory});
  }

  panelFor(ev) {
    const mode = String(ev.mode || "").toUpperCase();
    for (const r of this.routes) {
      if (r.modes.includes(mode)) return this.ensure(r.title, r.factory);
    }
    if (!this.generic)
      this.generic = this.ensure("Messages", () => new GenericPanel());
    return this.generic;
  }

  ensure(title, factory) {
    let entry = this.panels.get(title);
    if (entry) return entry.panel;
    const panel = factory();
    const tab = el("button", {class: "msg-tab",
      onclick: () => this.activate(panel.title)}, panel.title);
    this.tabBar.appendChild(tab);
    this.panelArea.appendChild(panel.root);
    panel.root.style.display = "none";
    this.panels.set(panel.title, {panel, tab});
    if (!this.active) this.activate(panel.title);
    return panel;
  }

  activate(title) {
    for (const [t, e] of this.panels) {
      e.panel.root.style.display = t === title ? "block" : "none";
      e.tab.classList.toggle("active", t === title);
    }
    this.active = title;
  }

  add(ev) {
    const panel = this.panelFor(ev);
    panel.add(ev);
    const entry = this.panels.get(panel.title);
    if (entry && this.active !== panel.title)
      entry.tab.classList.add("unread");
    if (entry && this.active === panel.title)
      entry.tab.classList.remove("unread");
    this.container.style.display = "block";
  }

  clearAll() {
    for (const e of this.panels.values()) e.panel.clear();
  }
}

window.MessagePanelManager = MessagePanelManager;
