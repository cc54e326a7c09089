"""Evaluation harnesses: metrics, short/long-term SMPL, skeleton tracks."""
