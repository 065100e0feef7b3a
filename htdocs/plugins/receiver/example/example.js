/* Example receiver plugin (reference plugins/receiver/example): logs
 * server messages and paints a marker when the waterfall starts. */
Plugins.register("example", () => {
  console.log("[example plugin] loaded");
  Plugins.on("server_message", (msg) => {
    if (msg.type === "receiver_details")
      console.log("[example plugin] connected to", msg.value.receiver_name);
  });
  let rows = 0;
  Plugins.on("fft", () => {
    if (++rows === 1) console.log("[example plugin] waterfall flowing");
  });
});
