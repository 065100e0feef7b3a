/* Lookup panel: callsign / MMSI details on click.
 *
 * Parity target: reference htdocs/lib/Lookup.js (1176 LoC: callsign,
 * vessel and flight info panels with external links). Implementation is
 * original: queries this server's /api/lookup for country/entity data
 * and renders a floating panel with configurable external links
 * (callsign_url / vessel_url from the receiver config).
 */
"use strict";

const Lookup = {
  panel: null,

  ensure() {
    if (this.panel) return this.panel;
    const p = document.createElement("div");
    p.className = "lookup-panel";
    p.style.display = "none";
    p.innerHTML = `
      <div class="lookup-head">
        <span id="lookup-title"></span>
        <button id="lookup-close">×</button>
      </div>
      <div id="lookup-body"></div>
      <div id="lookup-links"></div>`;
    document.body.appendChild(p);
    p.querySelector("#lookup-close").onclick = () => this.hide();
    this.panel = p;
    return p;
  },

  hide() { if (this.panel) this.panel.style.display = "none"; },

  async show(query) {
    const p = this.ensure();
    query = String(query).trim();
    if (!query) return;
    p.querySelector("#lookup-title").textContent = query;
    const body = p.querySelector("#lookup-body");
    body.textContent = "looking up…";
    p.style.display = "block";
    let info = null;
    try {
      const r = await fetch(`/api/lookup?q=${encodeURIComponent(query)}`);
      if (r.ok) info = await r.json();
    } catch (e) { /* offline: links still work */ }
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
      row("country", info.country);
      if (info.itu_code) row("ISO", info.itu_code.toUpperCase());
    } else if (info && info.kind === "mmsi") {
      row("type", `MMSI — ${info.type || ""}`);
      row("country", info.country);
    } else if (info && info.kind === "flight") {
      row("type", "flight / aircraft");
      row("registration", info.registration);
      row("country", info.country);
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
    } else {
      add("callsign info", config.callsign_url);
    }
  },
};

window.Lookup = Lookup;
