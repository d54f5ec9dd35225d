"""Import-level pyvista stub (reference viz is never rendered here)."""


def __getattr__(name):
    raise RuntimeError(f"pyvista shim: '{name}' is not available in this environment")
