"""Stateful components: cuckoo filter, frontier shards, checkpoints."""
