"""Stateful components: per-tile spatial indexes (actor-hosted), broadcast
helpers, and checkpoint manifests."""
