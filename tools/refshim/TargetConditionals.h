/* Linux build shim for the reference oracle.
 *
 * The reference (/root/reference/base.h:52-65) only supports Windows/Apple and
 * #errors on anything else.  We compile it with -D__APPLE__ and provide this
 * stub TargetConditionals.h so the Apple code path resolves to "Mac OSX".
 * glibc provides u_int*_t in <sys/types.h>, so the type aliases work as-is.
 */
#ifndef __REFSHIM_TARGET_CONDITIONALS_H__
#define __REFSHIM_TARGET_CONDITIONALS_H__

#define TARGET_OS_IPHONE 0
#define TARGET_IPHONE_SIMULATOR 0
#define TARGET_OS_MAC 1

#endif
