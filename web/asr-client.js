/* Browser microphone → local STT endpoint (/api/asr).
 *
 * Speaks the FunASR client protocol the server implements
 * (livetalking_tpu/server/asr_server.py; reference server/asr_server.py
 * 124-256): send a JSON config with is_speaking:true, stream binary PCM16
 * mono 16 kHz chunks, send is_speaking:false, receive a transcript JSON.
 * Clean-room replacement for the reference's vendored recorder-core.js.
 */
"use strict";

class AsrClient {
  constructor(opts) {
    this.url = (opts && opts.url) ||
      (location.protocol === "https:" ? "wss://" : "ws://") + location.host + "/api/asr";
    this.onTranscript = (opts && opts.onTranscript) || (() => {});
    this.onStatus = (opts && opts.onStatus) || (() => {});
    this.targetRate = 16000;
    this.ws = null;
    this.ctx = null;
    this.stream = null;
    this.node = null;
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

    this.stream = await navigator.mediaDevices.getUserMedia({
      audio: { channelCount: 1, echoCancellation: true, noiseSuppression: true },
    });
    this.ctx = new (window.AudioContext || window.webkitAudioContext)();
    const source = this.ctx.createMediaStreamSource(this.stream);
    // ScriptProcessor keeps this dependency-free; 4096 frames ≈ 85 ms @48k.
    this.node = this.ctx.createScriptProcessor(4096, 1, 1);
    this.node.onaudioprocess = (evt) => {
      if (!this.ws || this.ws.readyState !== WebSocket.OPEN) return;
      const f32 = evt.inputBuffer.getChannelData(0);
      const pcm16 = this._resampleToPcm16(f32, this.ctx.sampleRate);
      if (pcm16.length) this.ws.send(pcm16.buffer);
    };
    source.connect(this.node);
    this.node.connect(this.ctx.destination);
    this.onStatus("recording");
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
