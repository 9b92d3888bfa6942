/* LiveTalking-TPU browser client library.
 *
 * WebRTC negotiation against POST /offer plus thin helpers for the JSON
 * business API. Mirrors the behavior of the reference web/client.js
 * (recvonly transceivers, wait for ICE gathering complete, POST the local
 * offer, remember the returned sessionid) without sharing any code.
 */
"use strict";

const LT = (() => {
  let pc = null;
  let sessionid = null;
  let sse = null;

  function log(msg) {
    const el = document.getElementById("log");
    if (el) {
      el.textContent += msg + "\n";
      el.scrollTop = el.scrollHeight;
    }
    console.log(msg);
  }

  async function postJSON(url, body) {
    const resp = await fetch(url, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body || {}),
    });
    return resp.json();
  }

  function iceComplete(peer) {
    if (peer.iceGatheringState === "complete") return Promise.resolve();
    return new Promise((resolve) => {
      function check() {
        if (peer.iceGatheringState === "complete") {
          peer.removeEventListener("icegatheringstatechange", check);
          resolve();
        }
      }
      peer.addEventListener("icegatheringstatechange", check);
      // Belt and braces: don't hang forever on a pathological stack.
      setTimeout(resolve, 3000);
    });
  }

  /** Open a WebRTC session. opts: {stun, video, audio, extraParams} */
  async function connect(opts) {
    opts = opts || {};
    const config = {};
    if (opts.stun) config.iceServers = [{ urls: [opts.stun] }];
    pc = new RTCPeerConnection(config);

    pc.addEventListener("track", (evt) => {
      const el = document.getElementById(evt.track.kind); // <video id="video">, <audio id="audio">
      if (el) el.srcObject = evt.streams[0];
      log("track: " + evt.track.kind);
    });
    pc.addEventListener("connectionstatechange", () => {
      log("connection: " + pc.connectionState);
      if (typeof opts.onstate === "function") opts.onstate(pc.connectionState);
    });

    pc.addTransceiver("video", { direction: "recvonly" });
    pc.addTransceiver("audio", { direction: "recvonly" });

    const localOffer = await pc.createOffer();
    await pc.setLocalDescription(localOffer);
    await iceComplete(pc);

    const body = Object.assign(
      { sdp: pc.localDescription.sdp, type: pc.localDescription.type },
      opts.extraParams || {}
    );
    const answer = await postJSON("/offer", body);
    if (answer.code && answer.code !== 0) throw new Error(answer.msg || "offer failed");
    sessionid = answer.sessionid;
    await pc.setRemoteDescription({ sdp: answer.sdp, type: answer.type });
    log("connected, sessionid=" + sessionid);
    return sessionid;
  }

  function disconnect() {
    if (sse) {
      sse.close();
      sse = null;
    }
    if (pc) {
      pc.getTransceivers().forEach((t) => t.stop && t.stop());
      pc.close();
      pc = null;
    }
    sessionid = null;
    log("disconnected");
  }

  /** Speak text verbatim (type=echo) or via the LLM (type=chat). */
  function human(text, type, interrupt, tts) {
    const body = { sessionid, text, type: type || "echo" };
    if (interrupt) body.interrupt = true;
    if (tts) body.tts = tts;
    return postJSON("/human", body);
  }

  function interruptTalk() {
    return postJSON("/interrupt_talk", { sessionid });
  }

  function isSpeaking() {
    return postJSON("/is_speaking", { sessionid }).then((r) => r.data);
  }

  function setAudiotype(audiotype, reinit) {
    return postJSON("/set_audiotype", { sessionid, audiotype, reinit: !!reinit });
  }

  function record(start) {
    return postJSON("/record", {
      sessionid,
      type: start ? "start_record" : "end_record",
    });
  }

  /** Upload an audio file to drive the avatar directly. */
  async function humanAudio(file) {
    const form = new FormData();
    form.append("sessionid", sessionid);
    form.append("file", file);
    const resp = await fetch("/humanaudio", { method: "POST", body: form });
    return resp.json();
  }

  /** Subscribe to server-sent eventpoints (TTS start/end at playback time). */
  function subscribeEvents(cb) {
    if (sse) sse.close();
    sse = new EventSource("/sse?sessionid=" + encodeURIComponent(sessionid));
    sse.onmessage = (evt) => cb(evt.data);
    return sse;
  }

  return {
    connect,
    disconnect,
    human,
    humanAudio,
    interruptTalk,
    isSpeaking,
    setAudiotype,
    record,
    subscribeEvents,
    postJSON,
    log,
    get sessionid() {
      return sessionid;
    },
    get pc() {
      return pc;
    },
  };
})();
