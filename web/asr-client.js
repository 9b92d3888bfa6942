/* Browser microphone → local STT endpoint (/api/asr).
 *
 * Speaks the FunASR client protocol the server implements
 * (livetalking_tpu/server/asr_server.py; reference server/asr_server.py
 * 124-256): send a JSON config with is_speaking:true, stream binary PCM16
 * mono 16 kHz chunks, send is_speaking:false, receive a transcript JSON.
 *
 * Clean-room replacement for the reference's vendored recorder-core.js
 * (reference web/asr/recorder-core.js:1-1492), covering its production
 * feature set the TPU repo previously skipped:
 *   - sample-rate fallback matrix: asks the AudioContext for 16 kHz
 *     directly (no resample) and falls back through the device default
 *     when the UA refuses the constructor hint;
 *   - capture-constraint fallback: AGC/echo/noise constraints are
 *     attempted first and dropped wholesale if getUserMedia rejects them
 *     (some mobile UAs throw OverconstrainedError);
 *   - buffer management: resampled PCM accumulates into fixed-duration
 *     chunks (default 120 ms) so the socket sees a steady cadence
 *     regardless of the ScriptProcessor quantum;
 *   - level metering: per-buffer RMS → 0-100 log scale (the
 *     recorder-core.js powerLevel formula), surfaced via onLevel for
 *     UI meters.
 */
"use strict";

class AsrClient {
  constructor(opts) {
    opts = opts || {};
    this.url = opts.url ||
      (location.protocol === "https:" ? "wss://" : "ws://") + location.host + "/api/asr";
    this.onTranscript = opts.onTranscript || (() => {});
    this.onStatus = opts.onStatus || (() => {});
    this.onLevel = opts.onLevel || (() => {});     // (0-100, srcRate)
    this.targetRate = 16000;
    this.chunkMs = opts.chunkMs || 120;            // send cadence
    this.constraints = opts.constraints || {
      channelCount: 1,
      echoCancellation: true,
      noiseSuppression: true,
      autoGainControl: opts.agc !== undefined ? !!opts.agc : true,
    };
    this.ws = null;
    this.ctx = null;
    this.stream = null;
    this.node = null;
    this._pending = new Int16Array(0);
    this.info = {};                                // filled by start()
  }

  async start() {
    this.ws = new WebSocket(this.url);
    this.ws.binaryType = "arraybuffer";
    await new Promise((resolve, reject) => {
      this.ws.onopen = resolve;
      this.ws.onerror = () => reject(new Error("WebSocket connect failed"));
    });
    this.ws.onmessage = (evt) => {
      try {
        const msg = JSON.parse(evt.data);
        if (msg.text !== undefined) this.onTranscript(msg);
      } catch (e) { /* non-JSON frame */ }
    };
    this.ws.send(JSON.stringify({
      mode: "offline",
      chunk_size: [5, 10, 5],
      chunk_interval: 10,
      wav_name: "mic",
      is_speaking: true,
      itn: true,
    }));

    // constraint fallback matrix: full set → audio:true
    try {
      this.stream = await navigator.mediaDevices.getUserMedia({ audio: this.constraints });
      this.info.constraints = "full";
    } catch (e) {
      this.stream = await navigator.mediaDevices.getUserMedia({ audio: true });
      this.info.constraints = "fallback:" + e.name;
    }

    // sample-rate fallback matrix: a 16 kHz context skips resampling
    // entirely; UAs that reject the hint get their default rate and we
    // resample. (Firefox historically threw on mismatched hints when a
    // stream was attached — treat any failure as "use the default".)
    this.ctx = null;
    try {
      const c = new (window.AudioContext || window.webkitAudioContext)({ sampleRate: this.targetRate });
      // some UAs silently ignore the hint — accept whatever came back
      this.ctx = c;
    } catch (e) {
      this.ctx = new (window.AudioContext || window.webkitAudioContext)();
    }
    if (this.ctx.state === "suspended") await this.ctx.resume(); // autoplay policy
    this.info.contextRate = this.ctx.sampleRate;
    this.info.resampling = this.ctx.sampleRate !== this.targetRate;

    const source = this.ctx.createMediaStreamSource(this.stream);
    // ScriptProcessor keeps this dependency-free; 4096 frames ≈ 85 ms @48k.
    this.node = this.ctx.createScriptProcessor(4096, 1, 1);
    this.node.onaudioprocess = (evt) => {
      if (!this.ws || this.ws.readyState !== WebSocket.OPEN) return;
      const f32 = evt.inputBuffer.getChannelData(0);
      this.onLevel(AsrClient.powerLevel(f32), this.ctx.sampleRate);
      const pcm16 = this.info.resampling
        ? this._resampleToPcm16(f32, this.ctx.sampleRate)
        : AsrClient.floatToPcm16(f32);
      this._enqueue(pcm16);
    };
    source.connect(this.node);
    this.node.connect(this.ctx.destination);
    this.onStatus("recording");
  }

  /** Accumulate into fixed-duration chunks before sending. */
  _enqueue(pcm16) {
    const merged = new Int16Array(this._pending.length + pcm16.length);
    merged.set(this._pending); merged.set(pcm16, this._pending.length);
    this._pending = merged;
    const chunk = Math.round(this.targetRate * this.chunkMs / 1000);
    while (this._pending.length >= chunk) {
      this.ws.send(this._pending.slice(0, chunk).buffer);
      this._pending = this._pending.slice(chunk);
    }
  }

  /** RMS power → 0-100 log scale (recorder-core.js:541-547 formula). */
  static powerLevel(f32) {
    let sum = 0;
    for (let i = 0; i < f32.length; i++) {
      const s = f32[i] * 32767;
      sum += s * s;
    }
    const power = sum / f32.length;
    if (power < 1251) return Math.round(power / 1250 * 10);
    return Math.round(Math.min(100,
      Math.max(0, (1 + Math.log(power / 10000) / Math.log(10)) * 100)));
  }

  static floatToPcm16(f32) {
    const out = new Int16Array(f32.length);
    for (let i = 0; i < f32.length; i++) {
      out[i] = Math.max(-32768, Math.min(32767, Math.round(f32[i] * 32767)));
    }
    return out;
  }

  /** Linear-resample float32 at srcRate to 16 kHz int16. */
  _resampleToPcm16(f32, srcRate) {
    const ratio = srcRate / this.targetRate;
    const n = Math.floor(f32.length / ratio);
    const out = new Int16Array(n);
    for (let i = 0; i < n; i++) {
      const pos = i * ratio;
      const i0 = Math.floor(pos);
      const i1 = Math.min(i0 + 1, f32.length - 1);
      const frac = pos - i0;
      const s = f32[i0] * (1 - frac) + f32[i1] * frac;
      out[i] = Math.max(-32768, Math.min(32767, Math.round(s * 32767)));
    }
    return out;
  }

  /** Stop capturing; tells the server the utterance ended so it decodes. */
  stop() {
    if (this.node) { this.node.disconnect(); this.node = null; }
    if (this.ctx) { this.ctx.close(); this.ctx = null; }
    if (this.stream) { this.stream.getTracks().forEach((t) => t.stop()); this.stream = null; }
    if (this.ws && this.ws.readyState === WebSocket.OPEN) {
      if (this._pending.length) {          // flush the partial tail chunk
        this.ws.send(this._pending.buffer);
        this._pending = new Int16Array(0);
      }
      this.ws.send(JSON.stringify({ is_speaking: false }));
    }
    this.onStatus("decoding");
  }

  close() {
    this.stop();
    if (this.ws) { this.ws.close(); this.ws = null; }
    this.onStatus("closed");
  }
}
