/* Receiver plugins framework (analog of the reference htdocs/plugins.js +
 * plugins/receiver/: third-party scripts extend the UI without patching
 * core files).
 *
 * A plugin is a JS file that calls Plugins.register(name, init).  The
 * init(app) hook runs once the receiver app exists; plugins may also
 * subscribe to events: Plugins.on("server_message", fn) fires for every
 * JSON down-message, Plugins.on("fft", fn) for every waterfall row.
 *
 * Load order: /plugins.json (optional, a JSON array of script URLs) is
 * fetched at startup; each listed script is injected.  Plugins.load(url)
 * also works from the browser console.
 */
"use strict";

window.Plugins = {
  _registry: {},
  _handlers: {},
  _app: null,

  register: function (name, init) {
    this._registry[name] = init;
    if (this._app !== null) {
      try { init(this._app); } catch (e) { console.error("plugin " + name, e); }
    }
  },

  on: function (event, fn) {
    (this._handlers[event] = this._handlers[event] || []).push(fn);
  },

  fire: function (event, data) {
    for (const fn of this._handlers[event] || []) {
      try { fn(data); } catch (e) { console.error("plugin handler", e); }
    }
  },

  load: function (url) {
    const s = document.createElement("script");
    s.src = url;
    s.onerror = () => console.warn("plugin failed to load: " + url);
    document.head.appendChild(s);
  },

  /* called by the receiver app once it is constructed */
  attach: function (app) {
    this._app = app;
    for (const name in this._registry) {
      try { this._registry[name](app); }
      catch (e) { console.error("plugin " + name, e); }
    }
  },

  init: function () {
    fetch("/plugins.json")
      .then((r) => (r.ok ? r.json() : []))
      .then((list) => { for (const url of list || []) this.load(url); })
      .catch(() => {});
  },
};

Plugins.init();
