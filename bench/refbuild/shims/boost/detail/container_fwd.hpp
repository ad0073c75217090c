// Empty stand-in: the reference includes this header but uses nothing
// from it (Block.cc:36).
#ifndef GAM_SHIM_BOOST_CONTAINER_FWD_
#define GAM_SHIM_BOOST_CONTAINER_FWD_
#endif
