/* Sort the profile selector alphabetically (reference
 * plugins/receiver/sort_profiles). */
Plugins.register("sort_profiles", () => {
  Plugins.on("server_message", (msg) => {
    if (msg.type !== "profiles") return;
    const sel = document.getElementById("profiles");
    if (!sel) return;
    const opts = Array.from(sel.options);
    opts.sort((a, b) => a.textContent.localeCompare(b.textContent));
    const value = sel.value;
    sel.innerHTML = "";
    for (const o of opts) sel.appendChild(o);
    sel.value = value;
  });
});
