"""Reusable distributed operators (dedup, similarity, snapshot, multimodal)."""
