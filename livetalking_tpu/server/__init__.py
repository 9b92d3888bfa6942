"""HTTP/WebRTC API server layer."""
