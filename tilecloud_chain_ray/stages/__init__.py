"""map_batches stages: filters, geocode, render, split, hash-drop, joins."""
