"""Sources: the GA Core Reporting API connector (offline-testable request
builder + response shaper) and schema-declared file readers."""
