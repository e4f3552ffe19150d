"""Web UI (Gradio Blocks) + i18n. Gradio is optional: importing this package
is safe everywhere; launching the app requires the gradio wheel."""

from .i18n import I18nAuto

__all__ = ["I18nAuto"]
