"""Offline tools: RD plotting/BD-rate, figure montages, dataset patching."""
