"""Scene layer: JSON schema, loaders, STL import, SoA device conversion."""
