/* Minimal WHEP (WebRTC-HTTP Egress Protocol) player.
 *
 * Pulls the stream an rtcpush-transport server pushed into an SRS/WHIP
 * media server. Clean-room replacement for the reference's vendored
 * srs.sdk.js / whep.js demo SDKs: POST local SDP offer (application/sdp)
 * to the WHEP endpoint, apply the SDP answer.
 */
"use strict";

async function whepPlay(url, videoEl, audioEl) {
  const pc = new RTCPeerConnection();
  pc.addTransceiver("video", { direction: "recvonly" });
  pc.addTransceiver("audio", { direction: "recvonly" });
  pc.addEventListener("track", (evt) => {
    const el = evt.track.kind === "video" ? videoEl : audioEl;
    if (el) el.srcObject = evt.streams[0];
  });

  const offer = await pc.createOffer();
  await pc.setLocalDescription(offer);

  const resp = await fetch(url, {
    method: "POST",
    headers: { "Content-Type": "application/sdp" },
    body: pc.localDescription.sdp,
  });
  if (!resp.ok) {
    pc.close();
    throw new Error("WHEP endpoint returned " + resp.status);
  }
  const answerSdp = await resp.text();
  await pc.setRemoteDescription({ type: "answer", sdp: answerSdp });
  return pc;
}
