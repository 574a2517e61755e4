"""Scene & resources layer (ref L1: src/scene.*, src/hdr_sampling.*,
src/accelstruct.*): host-side import -> flat device arrays."""
