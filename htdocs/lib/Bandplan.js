/* Bandplan ribbon + bookmark bar with editor dialog.
 *
 * Parity targets: reference htdocs/lib/Bandplan.js (131 LoC, colored band
 * segments under the frequency scale) + lib/BookmarkBar.js (199) +
 * lib/BookmarkDialog.js (editor with name/frequency/modulation fields,
 * localStorage for anonymous users, server store for admins) +
 * lib/BookmarkLocalStorage.js. Implementation is original.
 */
"use strict";

/* deterministic pastel color per band tag/name */
function bandColor(name) {
  let h = 0;
  for (const c of name) h = (h * 31 + c.charCodeAt(0)) % 360;
  return `hsla(${h}, 55%, 45%, 0.55)`;
}

class Bandplan {
  constructor(container) {
    this.container = container;              /* positioned ribbon div */
    this.bands = [];
  }
  setBands(bands) {
    this.bands = bands || [];
    this.draw();
  }
  /* view: fn returning [loFreq, hiFreq] of the visible span */
  attach(viewFn) { this.viewFn = viewFn; }
  draw() {
    if (!this.viewFn) return;
    const [fLo, fHi] = this.viewFn();
    const w = this.container.clientWidth;
    this.container.innerHTML = "";
    for (const b of this.bands) {
      const lo = Math.max(b.low_bound, fLo), hi = Math.min(b.high_bound, fHi);
      if (hi <= lo) continue;
      const el = document.createElement("div");
      el.className = "band-segment";
      el.style.left = ((lo - fLo) / (fHi - fLo) * w) + "px";
      el.style.width = Math.max(2, (hi - lo) / (fHi - fLo) * w) + "px";
      el.style.background = bandColor(b.name);
      el.textContent = b.name;
      el.title = `${b.name}: ${(b.low_bound/1e6).toFixed(3)}–` +
                 `${(b.high_bound/1e6).toFixed(3)} MHz` +
                 (b.tags && b.tags.length ? ` [${b.tags.join(",")}]` : "");
      this.container.appendChild(el);
    }
  }
}

/* client-side bookmark persistence for anonymous users */
class BookmarkLocalStorage {
  key() { return "openwebrx-tpu-bookmarks"; }
  get() {
    try { return JSON.parse(localStorage.getItem(this.key()) || "[]"); }
    catch (e) { return []; }
  }
  set(list) { localStorage.setItem(this.key(), JSON.stringify(list)); }
  add(bm) { const l = this.get(); l.push(bm); this.set(l); }
  remove(name) { this.set(this.get().filter(b => b.name !== name)); }
  replace(name, bm) {
    this.set(this.get().map(b => b.name === name ? bm : b));
  }
}

/* modal editor dialog (reference lib/BookmarkDialog.js) */
class BookmarkDialog {
  constructor(app) {
    this.app = app;
    this.store = new BookmarkLocalStorage();
    this.root = null;
  }
  build() {
    const root = document.createElement("div");
    root.className = "dialog-backdrop";
    root.innerHTML = `
      <div class="dialog">
        <h3 id="bm-dialog-title">Add bookmark</h3>
        <label>Name <input id="bm-name" maxlength="32"></label>
        <label>Frequency (MHz) <input id="bm-freq" type="number" step="0.000001"></label>
        <label>Modulation <select id="bm-mod"></select></label>
        <label><input id="bm-scannable" type="checkbox"> scannable</label>
        <div class="dialog-buttons">
          <button id="bm-delete" class="danger" style="display:none">Delete</button>
          <span style="flex:1"></span>
          <button id="bm-cancel">Cancel</button>
          <button id="bm-save" class="primary">Save</button>
        </div>
      </div>`;
    document.body.appendChild(root);
    root.addEventListener("click", (e) => { if (e.target === root) this.close(); });
    root.querySelector("#bm-cancel").onclick = () => this.close();
    root.querySelector("#bm-save").onclick = () => this.save();
    root.querySelector("#bm-delete").onclick = () => this.remove();
    this.root = root;
    return root;
  }
  open(bookmark) {                           /* bookmark=null → add new */
    if (!this.root) this.build();
    this.editing = bookmark || null;
    const modSel = this.root.querySelector("#bm-mod");
    modSel.innerHTML = "";
    for (const m of (this.app.modes || []).filter(m => !m.service)) {
      const o = document.createElement("option");
      o.value = m.modulation; o.textContent = m.name;
      modSel.appendChild(o);
    }
    this.root.querySelector("#bm-dialog-title").textContent =
      bookmark ? "Edit bookmark" : "Add bookmark";
    this.root.querySelector("#bm-name").value = bookmark ? bookmark.name : "";
    this.root.querySelector("#bm-freq").value = bookmark
      ? (bookmark.frequency / 1e6).toFixed(6)
      : (((this.app.config.center_freq || 0) + this.app.offset) / 1e6).toFixed(6);
    if (bookmark && bookmark.modulation) modSel.value = bookmark.modulation;
    else if (this.app.mode) modSel.value = this.app.mode;
    this.root.querySelector("#bm-scannable").checked =
      bookmark ? !!bookmark.scannable : false;
    this.root.querySelector("#bm-delete").style.display =
      bookmark ? "inline-block" : "none";
    this.root.style.display = "flex";
  }
  close() { if (this.root) this.root.style.display = "none"; }
  current() {
    return {
      name: this.root.querySelector("#bm-name").value.trim(),
      frequency: Math.round(parseFloat(
        this.root.querySelector("#bm-freq").value) * 1e6),
      modulation: this.root.querySelector("#bm-mod").value,
      scannable: this.root.querySelector("#bm-scannable").checked,
      source: "local",
    };
  }
  save() {
    const bm = this.current();
    if (!bm.name || !isFinite(bm.frequency)) return;
    if (this.editing) this.store.replace(this.editing.name, bm);
    else this.store.add(bm);
    this.close();
    if (this.onchange) this.onchange();
  }
  remove() {
    if (this.editing) this.store.remove(this.editing.name);
    this.close();
    if (this.onchange) this.onchange();
  }
}

window.Bandplan = Bandplan;
window.BookmarkLocalStorage = BookmarkLocalStorage;
window.BookmarkDialog = BookmarkDialog;
