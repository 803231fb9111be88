"""Text-analysis query plans over the `documents` fixture (filled in by
operators/text.py — language ID, quality scoring, token counting,
fingerprinting)."""
