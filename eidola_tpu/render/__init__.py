"""Render stages: config, G-buffer, ReSTIR DI/GI, denoise, compose, post, frame."""
