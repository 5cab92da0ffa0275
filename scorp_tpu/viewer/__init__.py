from .network_gui import NetworkGUI  # noqa: F401
