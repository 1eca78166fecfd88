"""Source/sink helpers: bucketed warehouse tables, medallion layout."""
