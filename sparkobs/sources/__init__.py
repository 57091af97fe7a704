"""Sources beyond plain tables: object-store listings, binary files."""
