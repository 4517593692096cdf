"""Host utilities: ground-truth reference crypto, serialization, SRS."""
