"""Project-file front end: JSON5 parsing, settings schema, patch loading."""
