"""Source connectors: seed lists, feed files, RSS/Atom, sitemaps."""
