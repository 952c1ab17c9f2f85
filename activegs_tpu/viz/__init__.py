from .viewer import MissionViewer, render_channel_panel  # noqa: F401
