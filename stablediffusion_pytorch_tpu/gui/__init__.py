"""Interactive mask-painter GUIs (tkinter frontend, JAX sampling backend)."""
