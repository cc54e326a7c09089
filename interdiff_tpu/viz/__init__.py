"""Host-side visualization (gif rendering) — optional extras."""
