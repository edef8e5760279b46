"""Plan inspection and physical-layout utilities."""
