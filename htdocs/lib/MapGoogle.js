/* Google Maps backend for the map page (reference htdocs/map-google.js).
 *
 * Drop-in alternative to the canvas SlippyMap (lib/Map.js): exposes the
 * same surface map.html drives — markers/calls/filters/update()/expire()/
 * draw()/onselect/center/zoom — but renders through the Google Maps JS
 * API, loaded on demand with the deployment's ``google_maps_api_key``
 * (config key forwarded on the map websocket, web/connection.py:758).
 * Selected with ``map_type: "google"``; without a key the page stays on
 * the built-in canvas engine.  Original implementation: only the wire
 * config keys and the Google API surface are shared with the reference.
 */
"use strict";

function loadGoogleMapsApi(key) {
  return new Promise((resolve, reject) => {
    if (window.google && window.google.maps) return resolve(window.google.maps);
    const cb = "__owrxGmapsReady";
    window[cb] = () => resolve(window.google.maps);
    const s = document.createElement("script");
    s.src = "https://maps.googleapis.com/maps/api/js?key=" +
      encodeURIComponent(key) + "&callback=" + cb;
    s.onerror = () => reject(new Error("Google Maps API failed to load"));
    document.head.appendChild(s);
  });
}

class GoogleMapBackend {
  /* container replaces the canvas; gmaps = window.google.maps */
  constructor(container, gmaps, opts) {
    this.gmaps = gmaps;
    this.opts = opts || {};
    this.markers = new Map();          /* callsign → record */
    this.gmarkers = new Map();         /* callsign → gmaps.Marker */
    this.calls = [];
    this.glines = [];
    this.filters = {mode: "", band: ""};
    this.nite = false;                 /* overlay not drawn on this backend */
    this.hover = null;
    this.onselect = null;
    this.tiles = new Map();            /* surface compat (unused) */
    this.tilesBroken = 0;
    this.tileUrl = null;
    this.map = new gmaps.Map(container, {
      center: {lat: 30, lng: 0},
      zoom: 3,
      mapTypeId: this.opts.mapTypeId || "terrain",
      streetViewControl: false,
      fullscreenControl: false,
    });
    this.info = new gmaps.InfoWindow();
  }

  get center() {
    const c = this.map.getCenter();
    return {lat: c.lat(), lon: c.lng()};
  }
  set center(v) { this.map.panTo({lat: v.lat, lng: v.lon}); }
  get zoom() { return this.map.getZoom(); }
  set zoom(z) { this.map.setZoom(z); }

  offline() { return false; }
  resize() {}

  _visible(rec) {
    return (!this.filters.mode || rec.mode === this.filters.mode) &&
           (!this.filters.band || rec.band === this.filters.band);
  }

  _marker(rec) {
    let m = this.gmarkers.get(rec.callsign);
    if (!m) {
      m = new this.gmaps.Marker({map: this.map, title: rec.callsign});
      m.addListener("click", () => {
        this.info.setContent(
          `<b>${rec.callsign}</b><br>` +
          `${rec.mode || ""} ${rec.band || ""}<br>` +
          (rec.location.locator || "") +
          (rec.comment ? `<br>${rec.comment}` : ""));
        this.info.open(this.map, m);
        if (this.onselect) this.onselect(this.markers.get(rec.callsign));
      });
      this.gmarkers.set(rec.callsign, m);
    }
    m.setPosition({lat: rec.location.lat, lng: rec.location.lon});
    return m;
  }

  update(records) {
    for (const rec of records || []) {
      if (!rec.location || !isFinite(rec.location.lat)) continue;
      rec.lastseen = rec.lastseen || Date.now();
      this.markers.set(rec.callsign, rec);
      this._marker(rec);
    }
    this.draw();
  }

  expire(retentionMs) {
    const cutoff = Date.now() - retentionMs;
    for (const [k, v] of this.markers) {
      if (v.lastseen < cutoff) {
        this.markers.delete(k);
        const m = this.gmarkers.get(k);
        if (m) { m.setMap(null); this.gmarkers.delete(k); }
      }
    }
  }

  /* sync marker visibility with the filters; calls render as polylines */
  draw() {
    for (const [k, m] of this.gmarkers) {
      const rec = this.markers.get(k);
      m.setVisible(!!rec && this._visible(rec));
    }
    for (const l of this.glines) l.setMap(null);
    this.glines = [];
    for (const call of this.calls || []) {
      const a = this.markers.get(call.from), b = this.markers.get(call.to);
      if (!a || !b || !this._visible(a) || !this._visible(b)) continue;
      this.glines.push(new this.gmaps.Polyline({
        map: this.map,
        path: [{lat: a.location.lat, lng: a.location.lon},
               {lat: b.location.lat, lng: b.location.lon}],
        strokeColor: "#3fa9f5", strokeWeight: 1.5, strokeOpacity: 0.7,
      }));
    }
  }
}

/* swap the canvas engine for Google Maps once config names it; existing
   markers migrate so nothing is lost on the handover */
async function upgradeToGoogleMap(current, canvas, cfg) {
  const gmaps = await loadGoogleMapsApi(cfg.google_maps_api_key);
  const holder = document.createElement("div");
  holder.id = "gmap";
  holder.style.width = "100%";
  holder.style.height = canvas.style.height || "68vh";
  canvas.style.display = "none";
  canvas.parentNode.insertBefore(holder, canvas);
  const g = new GoogleMapBackend(holder, gmaps, {});
  g.onselect = current.onselect;
  g.filters = current.filters;
  g.calls = current.calls || [];
  g.update([...current.markers.values()]);
  if (cfg.receiver_gps && isFinite(cfg.receiver_gps.lat)) {
    g.center = {lat: cfg.receiver_gps.lat, lon: cfg.receiver_gps.lon};
    g.zoom = 5;
  }
  return g;
}

window.GoogleMapBackend = GoogleMapBackend;
window.upgradeToGoogleMap = upgradeToGoogleMap;
window.loadGoogleMapsApi = loadGoogleMapsApi;
