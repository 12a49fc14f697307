"""Interactive-session services: annotator, volume binding, workspace, web app."""
