"""Application layer: headless driver (main-loop analog)."""
