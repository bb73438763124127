"""Dataset sources: coordinate enumeration, pages synthesis, tiles-file."""
