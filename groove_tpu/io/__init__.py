"""Host I/O: WAV read/write, sample assets."""
