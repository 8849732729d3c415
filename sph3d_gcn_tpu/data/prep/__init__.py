"""Offline data preparation (Python ports of the reference's MATLAB
`preprocesing/` + `io/` TFRecord makers — SURVEY.md §2.6)."""
