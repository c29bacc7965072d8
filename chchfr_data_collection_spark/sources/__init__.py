"""Source connectors: JSON landing-zone readers + dialect conformance."""
