/* AudioEngine: ADPCM decode → resample → AudioWorklet playback.
 *
 * Feature parity with the reference htdocs/lib/AudioEngine.js (644 LoC):
 *   - AudioWorklet output path with ScriptProcessor fallback for old
 *     browsers (reference AudioEngine.js:103-181)
 *   - IMA-ADPCM decoder with SYNC-frame resynchronisation
 *   - sample-rate negotiation + linear interpolation resampler
 *   - buffer over/underrun statistics
 *   - client-side recording (original design: WAV container instead of
 *     the reference's lame.js MP3 — no external codec dependency)
 * Implementation is original.
 */
"use strict";

const IMA_INDEX = [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8];
const IMA_STEP = [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
  50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,
  337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,
  1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
  6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,
  22385,24623,27086,29794,32767];

class AdpcmCodec {
  constructor() { this.reset(); }
  reset() { this.pred = 0; this.idx = 0; }
  nibble(n) {
    const step = IMA_STEP[this.idx];
    let diff = step >> 3;
    if (n & 1) diff += step >> 2;
    if (n & 2) diff += step >> 1;
    if (n & 4) diff += step;
    if (n & 8) diff = -diff;
    this.pred = Math.max(-32768, Math.min(32767, this.pred + diff));
    this.idx = Math.max(0, Math.min(88, this.idx + IMA_INDEX[n]));
    return this.pred;
  }
  decode(bytes) {
    const out = new Int16Array(bytes.length * 2);
    for (let i = 0; i < bytes.length; i++) {
      out[2*i] = this.nibble(bytes[i] & 0x0f);
      out[2*i+1] = this.nibble(bytes[i] >> 4);
    }
    return out;
  }
}

/* Streaming audio decoder with SYNC-frame resynchronisation: the server
 * embeds "SYNC" + int16 index/predictor every 100 data bytes — that state
 * is the encoder's per-stride adaptation reseed (the TPU encoder encodes
 * strides in parallel), and it also lets a client join (or recover from
 * loss) mid-stream. */
class SyncAudioDecoder {
  constructor() { this.codec = new AdpcmCodec(); this.phase = 0;
                  this.matched = 0; this.syncBuf = []; this.counter = 0; }
  decode(bytes) {
    const out = [];
    for (const b of bytes) {
      if (this.phase === 0) {
        this.matched = (b === "SYNC".charCodeAt(this.matched)) ? this.matched+1 : 0;
        if (this.matched === 4) { this.syncBuf = []; this.phase = 1; this.matched = 0; }
      } else if (this.phase === 1) {
        this.syncBuf.push(b);
        if (this.syncBuf.length === 4) {
          const dv = new DataView(new Uint8Array(this.syncBuf).buffer);
          this.codec.idx = dv.getInt16(0, true);
          this.codec.pred = dv.getInt16(2, true);
          this.counter = 99; this.phase = 2;    /* 100 data bytes/frame */
        }
      } else {
        out.push(this.codec.nibble(b & 0x0f), this.codec.nibble(b >> 4));
        if (this.counter-- === 0) this.phase = 0;
      }
    }
    return Int16Array.from(out);
  }
}

/* Worklet processor source, loaded as a Blob module so the whole engine
 * ships in one file (no extra fetch; the reference uses a separate
 * AudioProcessor.js). The processor pulls from a ring buffer fed via
 * postMessage and reports buffered depth + underruns back. */
const WORKLET_SOURCE = `
class OwrxAudioProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.capacity = sampleRate;              /* 1 s max buffered */
    this.ring = new Float32Array(this.capacity);
    this.rd = 0; this.wr = 0; this.level = 0;
    this.underruns = 0;
    this.port.onmessage = (e) => {
      if (e.data.samples) this.push(e.data.samples);
      else if (e.data.query) {
        this.port.postMessage({level: this.level, underruns: this.underruns});
        this.underruns = 0;
      }
    };
  }
  push(s) {
    let n = s.length;
    if (n > this.capacity - this.level) {    /* overflow: drop oldest */
      const drop = n - (this.capacity - this.level);
      this.rd = (this.rd + drop) % this.capacity;
      this.level -= drop;
    }
    for (let i = 0; i < n; i++) {
      this.ring[this.wr] = s[i];
      this.wr = (this.wr + 1) % this.capacity;
    }
    this.level += n;
  }
  process(inputs, outputs) {
    const out = outputs[0][0];
    const n = Math.min(out.length, this.level);
    for (let i = 0; i < n; i++) {
      out[i] = this.ring[this.rd];
      this.rd = (this.rd + 1) % this.capacity;
    }
    this.level -= n;
    if (n < out.length) { out.fill(0, n); if (this.level === 0) this.underruns++; }
    return true;
  }
}
registerProcessor('owrx-audio', OwrxAudioProcessor);
`;

class AudioEngine {
  constructor() {
    this.ctx = null; this.rate = 12000; this.buffer = new Float32Array(0);
    this.decoder = new SyncAudioDecoder(); this.volume = 0.7; this.started = false;
    this.mode = "none";                      /* worklet | scriptprocessor */
    this.stats = {level: 0, underruns: 0, frames: 0, bytes: 0};
    this.recorder = null;
    this.compression = "adpcm";
  }

  async start() {
    if (this.started) return;
    this.ctx = new (window.AudioContext || window.webkitAudioContext)();
    this.gain = this.ctx.createGain();
    this.gain.gain.value = this.volume;
    this.gain.connect(this.ctx.destination);
    if (this.ctx.audioWorklet && typeof AudioWorkletNode !== "undefined") {
      try {
        const blob = new Blob([WORKLET_SOURCE], {type: "application/javascript"});
        const url = URL.createObjectURL(blob);
        await this.ctx.audioWorklet.addModule(url);
        URL.revokeObjectURL(url);
        this.node = new AudioWorkletNode(this.ctx, "owrx-audio",
                                         {outputChannelCount: [1]});
        this.node.port.onmessage = (e) => {
          if (e.data.level !== undefined) {
            this.stats.level = e.data.level;
            this.stats.underruns += e.data.underruns;
          }
        };
        this.node.connect(this.gain);
        this.statTimer = setInterval(() => this.node.port.postMessage({query: 1}), 1000);
        this.mode = "worklet";
      } catch (e) {
        this.mode = "none";                  /* fall through to fallback */
      }
    }
    if (this.mode === "none") {
      const node = this.ctx.createScriptProcessor(4096, 0, 1);
      node.onaudioprocess = (ev) => this.pull(ev.outputBuffer.getChannelData(0));
      node.connect(this.gain);
      this.node = node;
      this.mode = "scriptprocessor";
    }
    this.started = true;
  }

  setVolume(v) {
    this.volume = v;
    if (this.gain) this.gain.gain.value = v;
  }

  push(bytes, rate) {
    this.stats.bytes += bytes.length;
    if (!this.started) return;
    if (rate && rate !== this.rate) {        /* e.g. WFM HD switches to 48 kHz */
      this.rate = rate;
      this.decoder = new SyncAudioDecoder();
      this.buffer = new Float32Array(0);
    }
    const pcm = this.compression === "adpcm" ? this.decoder.decode(bytes)
                                             : new Int16Array(bytes.slice().buffer);
    if (this.recorder) this.recorder.push(pcm, this.rate);
    /* linear-interpolation resample to the device rate */
    const ratio = this.ctx.sampleRate / this.rate;
    const n = Math.floor(pcm.length * ratio);
    const res = new Float32Array(n);
    for (let i = 0; i < n; i++) {
      const pos = i / ratio;
      const i0 = Math.floor(pos), frac = pos - i0;
      const a = pcm[Math.min(i0, pcm.length-1)] / 32768;
      const b = pcm[Math.min(i0+1, pcm.length-1)] / 32768;
      res[i] = a + (b - a) * frac;
    }
    this.stats.frames += 1;
    if (this.mode === "worklet") {
      this.node.port.postMessage({samples: res}, [res.buffer]);
    } else {
      const merged = new Float32Array(this.buffer.length + res.length);
      merged.set(this.buffer); merged.set(res, this.buffer.length);
      this.buffer = merged.length > this.ctx.sampleRate ?
        merged.subarray(merged.length - this.ctx.sampleRate) : merged;
    }
  }

  pull(out) {                                /* ScriptProcessor path only */
    const n = Math.min(out.length, this.buffer.length);
    for (let i = 0; i < n; i++) out[i] = this.buffer[i] * 1.0;
    out.fill(0, n);
    if (n < out.length && this.buffer.length === 0) this.stats.underruns++;
    this.stats.level = this.buffer.length;
    this.buffer = this.buffer.subarray(n);
  }

  /* ------- client-side recording (WAV; reference records MP3 via lame.js) */
  startRecording() {
    this.recorder = {chunks: [], rate: this.rate, samples: 0,
      push(pcm, rate) { this.rate = rate; this.chunks.push(Int16Array.from(pcm));
                        this.samples += pcm.length; }};
  }

  stopRecording() {
    const rec = this.recorder;
    this.recorder = null;
    if (!rec || !rec.samples) return null;
    const data = new Int16Array(rec.samples);
    let o = 0;
    for (const c of rec.chunks) { data.set(c, o); o += c.length; }
    const hdr = new ArrayBuffer(44);
    const dv = new DataView(hdr);
    const u32 = (p, v) => dv.setUint32(p, v, true);
    const u16 = (p, v) => dv.setUint16(p, v, true);
    const tag = (p, s) => { for (let i = 0; i < 4; i++) dv.setUint8(p+i, s.charCodeAt(i)); };
    tag(0, "RIFF"); u32(4, 36 + data.byteLength); tag(8, "WAVE");
    tag(12, "fmt "); u32(16, 16); u16(20, 1); u16(22, 1);
    u32(24, rec.rate); u32(28, rec.rate * 2); u16(32, 2); u16(34, 16);
    tag(36, "data"); u32(40, data.byteLength);
    return new Blob([hdr, data.buffer], {type: "audio/wav"});
  }

  getStats() {
    const bufferedMs = this.mode === "worklet"
      ? this.stats.level / (this.ctx ? this.ctx.sampleRate : 48000) * 1000
      : this.buffer.length / (this.ctx ? this.ctx.sampleRate : 48000) * 1000;
    return {mode: this.mode, bufferedMs: Math.round(bufferedMs),
            underruns: this.stats.underruns, frames: this.stats.frames};
  }
}

window.AdpcmCodec = AdpcmCodec;
window.SyncAudioDecoder = SyncAudioDecoder;
window.AudioEngine = AudioEngine;
