"""Render engine: CompiledSong -> audio via one fused XLA program."""
