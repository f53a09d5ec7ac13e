"""Driver-looped crawl rounds (BSP micro-batches over frontier state)."""
