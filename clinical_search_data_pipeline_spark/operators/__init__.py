"""DataFrame -> DataFrame operator builders (the engine's verbs)."""
