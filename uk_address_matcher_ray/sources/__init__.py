"""Ray-Data-native address-matching engine (see SURVEY.md)."""
