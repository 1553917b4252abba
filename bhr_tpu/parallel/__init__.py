"""Device mesh + frame sharding for multi-chip rendering."""
