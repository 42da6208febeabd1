"""IO subsystem: FFmpeg command builder, video sinks, audio readers, and the
C++ frame pump (TurboPipe equivalent)."""
