"""End-to-end pipelines (driver-built Dataset plans). Analog of the
reference's XSLTNewProcessor compile phase + XSLTProcess run phase
(/root/reference/src/transform.c:507-557, 633-718): spec compiled once
on the driver, execution streamed by Ray Data."""
