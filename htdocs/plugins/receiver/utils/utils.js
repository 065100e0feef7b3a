/* Shared helpers for receiver plugins (reference plugins/receiver/utils):
 * tiny DOM/format utilities other plugins can rely on. */
Plugins.register("utils", () => {
  Plugins.utils = {
    el(tag, attrs, text) {
      const e = document.createElement(tag);
      for (const [k, v] of Object.entries(attrs || {})) e.setAttribute(k, v);
      if (text) e.textContent = text;
      return e;
    },
    formatHz(hz) {
      if (hz >= 1e6) return (hz / 1e6).toFixed(3) + " MHz";
      if (hz >= 1e3) return (hz / 1e3).toFixed(1) + " kHz";
      return hz + " Hz";
    },
    onReady(fn) {
      if (document.readyState !== "loading") fn();
      else document.addEventListener("DOMContentLoaded", fn);
    },
  };
});
