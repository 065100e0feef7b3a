/* Lookup: callsign / MMSI / aircraft entity resolution + country flags.
 *
 * Parity target: reference htdocs/lib/Lookup.js (callsign→country,
 * MMSI→country/type tables + flag helpers used across panels and map).
 * Implementation is original: the authoritative tables live SERVER-side
 * (core/lookup.py ITU ranges, services/icao.py) behind /api/lookup; the
 * client keeps an async resolution cache and re-renders rows when an
 * answer lands.  Flags are synthesized from ISO codes (regional
 * indicator pairs), as the reference does.
 */
"use strict";

const Lookup = {
  panel: null,
  _cache: new Map(),          /* query → info | null (resolved) */
  _pending: new Map(),        /* query → Promise */

  /* two-letter ISO code → flag emoji (reference ccode2flag) */
  flag(ccode) {
    if (!ccode || ccode.length !== 2) return "";
    const a = 0x1F1E6;
    return String.fromCodePoint(a + ccode.toUpperCase().charCodeAt(0) - 65,
                                a + ccode.toUpperCase().charCodeAt(1) - 65);
  },

  /* flag + name from {ccode, country} */
  countryText(info) {
    if (!info) return "";
    const f = this.flag(info.ccode);
    const n = info.country || "";
    return f && n ? `${f} ${n}` : (f || n);
  },

  /* cached async resolve; onready re-render hook fires when an answer
     arrives for a previously-unknown query */
  resolve(query, onready, kind) {
    query = String(query || "").trim();
    if (!query) return null;
    const key = kind ? `${kind}:${query}` : query;
    if (this._cache.has(key)) return this._cache.get(key);
    if (!this._pending.has(key)) {
      const extra = kind ? `&kind=${kind}` : "";
      const p = fetch(`/api/lookup?q=${encodeURIComponent(query)}${extra}`)
        .then(r => r.ok ? r.json() : null)
        .catch(() => null)
        .then(info => {
          this._cache.set(key, info);
          this._pending.delete(key);
          if (onready) onready(info);
          return info;
        });
      this._pending.set(key, p);
    } else if (onready) {
      this._pending.get(key).then(onready);
    }
    return undefined;           /* in flight */
  },

  /* synchronous helpers for table cells: empty until resolved */
  callsignFlag(callsign, onready) {
    const info = this.resolve(callsign, onready);
    return info ? this.flag(info.ccode) : "";
  },

  mmsiCountry(mmsi, onready) {
    const info = this.resolve(mmsi, onready);
    return info ? this.countryText(info) : "";
  },

  /* ----------------------------------------------------------- panel -- */
  _history: [],               /* recent queries, newest first */

  ensure() {
    if (this.panel) return this.panel;
    const p = document.createElement("div");
    p.className = "lookup-panel";
    p.style.display = "none";
    p.innerHTML = `
      <div class="lookup-head">
        <span id="lookup-title">Lookup</span>
        <button id="lookup-close">×</button>
      </div>
      <div class="lookup-search">
        <input id="lookup-input" type="text" spellcheck="false"
               placeholder="callsign / MMSI / ICAO hex"/>
        <button id="lookup-go">go</button>
      </div>
      <div id="lookup-body"></div>
      <div id="lookup-links"></div>
      <div id="lookup-history"></div>`;
    document.body.appendChild(p);
    p.querySelector("#lookup-close").onclick = () => this.hide();
    const input = p.querySelector("#lookup-input");
    const go = () => { if (input.value.trim()) this.show(input.value); };
    p.querySelector("#lookup-go").onclick = go;
    input.addEventListener("keydown", e => {
      if (e.key === "Enter") go();
      e.stopPropagation();      /* don't trigger receiver shortcuts */
    });
    this.panel = p;
    return p;
  },

  hide() { if (this.panel) this.panel.style.display = "none"; },

  /* open the panel with the search box focused (keyboard entry point) */
  open() {
    const p = this.ensure();
    p.style.display = "block";
    this._renderHistory();
    p.querySelector("#lookup-input").focus();
  },

  _remember(query) {
    this._history = [query,
                     ...this._history.filter(q => q !== query)].slice(0, 8);
    this._renderHistory();
  },

  _renderHistory() {
    const el = this.panel && this.panel.querySelector("#lookup-history");
    if (!el) return;
    el.innerHTML = "";
    if (!this._history.length) return;
    el.appendChild(Object.assign(document.createElement("div"),
                                 {className: "lookup-label",
                                  textContent: "recent"}));
    for (const q of this._history) {
      const b = document.createElement("button");
      b.className = "lookup-hist-btn";
      b.textContent = q;
      b.onclick = () => this.show(q);
      el.appendChild(b);
    }
  },

  async show(query, kind) {
    const p = this.ensure();
    query = String(query).trim();
    if (!query) return;
    this._remember(query);
    p.querySelector("#lookup-title").textContent = query;
    p.querySelector("#lookup-input").value = query;
    const body = p.querySelector("#lookup-body");
    body.textContent = "looking up…";
    p.style.display = "block";
    let info = this.resolve(query, null, kind);
    if (info === undefined)
      info = await this._pending.get(kind ? `${kind}:${query}` : query);
    body.innerHTML = "";
    const row = (label, value) => {
      if (value === undefined || value === null || value === "") return;
      const d = document.createElement("div");
      d.className = "lookup-row";
      d.innerHTML = `<span class="lookup-label"></span><span></span>`;
      d.children[0].textContent = label;
      d.children[1].textContent = value;
      body.appendChild(d);
    };
    if (info && info.kind === "callsign") {
      row("type", "amateur callsign");
      row("country", this.countryText(info));
      if (info.itu_code) row("ITU prefix", info.itu_code.toUpperCase());
      if (info.ccode) row("ISO", info.ccode.toUpperCase());
      if (info.continent) row("continent", info.continent);
      if (info.distance_km !== undefined)
        row("distance", `${Math.round(info.distance_km)} km`);
      if (info.bearing_deg !== undefined)
        row("bearing", `${Math.round(info.bearing_deg)}°`);
    } else if (info && info.kind === "mmsi") {
      row("type", `MMSI — ${info.type || ""}`);
      row("country", this.countryText(info));
      if (info.mid !== undefined) row("MID", info.mid);
    } else if (info && (info.kind === "aircraft" || info.kind === "flight")) {
      row("type", "aircraft (24-bit ICAO address)");
      row("registration", info.registration);
      row("country", this.countryText(info));
    } else {
      row("info", "no local data");
    }
    /* external links from receiver config */
    const links = p.querySelector("#lookup-links");
    links.innerHTML = "";
    const config = (window.app && window.app.config) || {};
    const add = (label, url) => {
      if (!url) return;
      const a = document.createElement("a");
      a.href = url.replaceAll("{}", encodeURIComponent(query));
      a.target = "_blank"; a.rel = "noopener";
      a.textContent = label;
      links.appendChild(a);
    };
    if (/^\d{7,9}$/.test(query)) {
      add("vessel info", config.vessel_url);
    } else if (/^[0-9a-fA-F]{6}$/.test(query) && info
               && info.kind === "aircraft") {
      add("flight info", config.flight_url);
    } else {
      add("callsign info", config.callsign_url);
    }
  },
};

window.Lookup = Lookup;
