"""Text analysis operators (token stats, quality, lang-id, fingerprints)."""
