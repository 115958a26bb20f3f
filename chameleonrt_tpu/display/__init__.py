from chameleonrt_tpu.display.display import (  # noqa: F401
    AnsiDisplay,
    Display,
    PngSequenceDisplay,
    make_display,
)
