"""Contrib: driver-contract query/oracle registry and other non-core glue."""
